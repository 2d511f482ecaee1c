from video_filler_tpu.utils.cache import host_keyed_cache_dir  # noqa: F401
from video_filler_tpu.utils.dashboard import Dashboard  # noqa: F401
from video_filler_tpu.utils.io import save_gif, save_image_grid, save_png  # noqa: F401
from video_filler_tpu.utils.logger import MetricsLogger  # noqa: F401
