from video_filler_tpu.checkpoint.ckpt import (  # noqa: F401
    checkpoint_path,
    prune_checkpoints,
    restore_checkpoint,
    restore_latest,
    restore_subtree,
    save_checkpoint,
    wait_pending_saves,
)
