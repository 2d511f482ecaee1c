"""Host data-pipeline throughput benchmark (images/s and clips/s).

The reference's training was DATA-BOUND (1.455 s/batch@64 with donkey
threads, training_logs:1).  This measures our host pipeline in isolation —
native C++ decode pool vs pure-Python fallback — so the "input pipeline keeps
up with the chip" claim is a number, not an assertion.

Usage: python scripts/bench_loader.py [n_images] [batch] [threads]
(creates a synthetic 360x480 corpus under /tmp, like the reference's frames)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from video_filler_tpu.config import Opt
    from video_filler_tpu.data import synthetic
    from video_filler_tpu.data.pipeline import DataLoader, make_sampler

    root = "/tmp/vf_loader_bench"
    if not os.path.isdir(os.path.join(root, "gt")):
        synthetic.make_video_corpus(root, n_videos=2, frames=max(n // 2, 8),
                                    h=360, w=480)
        synthetic.make_mask_png(os.path.join(root, "mask.png"), h=360, w=480)

    regimes = (("video", 4), ("wholeim", 1))
    for regime, frames_per in regimes:
        for native in (True, False):
            os.environ["VF_NO_NATIVE"] = "" if native else "1"
            opt = Opt(DATA_ROOT=root, maskName=os.path.join(root, "mask.png"),
                      loadSize=240, fineSize=128, predLen=4, batchSize=batch,
                      nThreads=threads)
            sampler, _ = make_sampler(opt, regime)
            with DataLoader(sampler, opt.nThreads, seed=1) as loader:
                loader.get_batch()  # warm the queue/workers
                # Pops that drain batches produced BEFORE t0 (up to the
                # pipeline's in-flight capacity: queued + in worker hands)
                # are free and would inflate the rate; time a fixed window
                # and exclude that credit.
                in_flight = max(threads, 1) * 3
                t0 = time.perf_counter()
                nb = 0
                while (time.perf_counter() - t0) < 20.0 or nb <= in_flight * 2:
                    loader.get_batch()
                    nb += 1
                dt = time.perf_counter() - t0
            clips = max(nb - in_flight, 1) * batch / dt
            cores = os.cpu_count() or 1
            frames = clips * frames_per
            detail = (f"predLen=4" if regime == "video"
                      else "full frame + translate + 3x3 slice")
            print(f"{regime} {'native C++' if native else 'pure python'}: "
                  f"{clips:,.0f} samples/s = {frames:,.0f} frames "
                  f"decoded+processed/s on {cores} core(s) "
                  f"(= {frames / cores:,.0f} frames/s/core; "
                  f"{threads} loader threads, {detail}, loadSize=240)")


if __name__ == "__main__":
    main()
