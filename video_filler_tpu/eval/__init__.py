from video_filler_tpu.eval.common import live_generator, load_generator  # noqa: F401
from video_filler_tpu.eval.demo import run_demo  # noqa: F401
from video_filler_tpu.eval.test_patch import run_test  # noqa: F401
from video_filler_tpu.eval.video import run_test_vid  # noqa: F401
from video_filler_tpu.eval.wholeim import run_wholeim  # noqa: F401
