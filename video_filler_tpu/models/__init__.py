from video_filler_tpu.models.context_encoder import (  # noqa: F401
    DiscriminatorSpec,
    GeneratorSpec,
    build_discriminator,
    build_generator,
    specs_for_regime,
)
