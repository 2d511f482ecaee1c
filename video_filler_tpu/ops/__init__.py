from video_filler_tpu.ops import image, layers, losses, masks  # noqa: F401
