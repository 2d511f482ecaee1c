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


def video3d_fine_size(opt) -> int:
    """The 3D family's square input side.  Video3DSpec.fine_size owns the
    formula (4 * 2**levels); serve/eval/export read it HERE instead of
    re-deriving it, so a change to the spatial ladder propagates."""
    return Video3DSpec(levels=opt.video3dLevels).fine_size


def build_for_regime(opt, regime, sp_mesh=None):
    """(generator Layer, discriminator Layer) for any regime, including the
    temporal 3D family ('video3d').  sp_mesh (('data','seq') Mesh) selects
    sequence-parallel temporal convs — video3d only."""
    if regime == "video3d":
        spec = Video3DSpec(nc=opt.nc, pred_len=opt.predLen, nef=opt.nef,
                           ngf=opt.ngf, ndf=opt.ndf,
                           n_bottleneck=opt.nBottleneck,
                           levels=opt.video3dLevels,
                           use_bias=opt.useBias, dtype=opt.computeDtype)
        return (build_generator3d(spec, sp_mesh),
                build_discriminator3d(spec, sp_mesh))
    if sp_mesh is not None:
        raise ValueError("sequence parallelism requires regime='video3d' "
                         "(the 2D regimes have no temporal axis)")
    gspec, dspec = specs_for_regime(opt, regime)
    return build_generator(gspec), build_discriminator(dspec)
