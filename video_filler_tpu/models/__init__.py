from video_filler_tpu.models.context_encoder import (  # noqa: F401
    DiscriminatorSpec,
    GeneratorSpec,
    build_discriminator,
    build_generator,
    specs_for_regime,
)
from video_filler_tpu.models.context_encoder_3d import (  # noqa: F401
    Video3DSpec,
    build_discriminator3d,
    build_generator3d,
)


def build_for_regime(opt, regime):
    """(generator Layer, discriminator Layer) for any regime, including the
    temporal 3D family ('video3d')."""
    if regime == "video3d":
        spec = Video3DSpec(nc=opt.nc, pred_len=opt.predLen, nef=opt.nef,
                           ngf=opt.ngf, ndf=opt.ndf,
                           n_bottleneck=opt.nBottleneck,
                           levels=opt.video3dLevels,
                           use_bias=opt.useBias, dtype=opt.computeDtype)
        return build_generator3d(spec), build_discriminator3d(spec)
    gspec, dspec = specs_for_regime(opt, regime)
    return build_generator(gspec), build_discriminator(dspec)
