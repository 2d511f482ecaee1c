from video_filler_tpu.ops.pallas.fused_loss import (  # noqa: F401
    fused_weighted_mse,
    pallas_supported,
)
