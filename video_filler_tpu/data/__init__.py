from video_filler_tpu.data.index import FolderIndex, PairedIndex, VideoCorpus  # noqa: F401
from video_filler_tpu.data.pipeline import DataLoader, make_sampler  # noqa: F401
