"""Device-side ms/frame for wholeim FULL-FRAME composite serving (round 4).

VERDICT r3 item 4 asked for a BASELINE.md device-side ms/frame row next to
the serve.py full-frame composite mode (frameH/frameW).  This times the
server's own jitted ``serve_fn`` — mask-fill, 3x3 patch-grid slice into 27
channels (donkey_wholeim.lua:152-211 geometry), one batched G forward,
2x2 scatter-composite (test_vid_wholeim.lua:207-220) — at the reference's
360x480 frame geometry, excluding HTTP and tunnel transfer:

* inputs are device_put ONCE; iterations chain the uint8 output frame back
  in as the next input (same shape), so execution is serial and un-elidable;
* timing ends with a scalar element fetch (axon's block_until_ready does
  not wait for remote execution — CLAUDE.md).

Uses the round-3 on-chip wholeim ledger checkpoint if present
(/tmp/lw_ledgers/checkpoints/lw_wi_final_999_state.npz), else fresh-init
weights (timing is weight-value-independent).

Usage: timeout 900 python scripts/bench_serve_wholeim.py [batch ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")  # env alone hangs (CLAUDE.md)

import jax  # noqa: E402
import numpy as np  # noqa: E402

from video_filler_tpu.checkpoint import save_checkpoint  # noqa: E402
from video_filler_tpu.config import Opt  # noqa: E402
from video_filler_tpu.serve import InpaintServer  # noqa: E402
from video_filler_tpu.train.step import init_train_state  # noqa: E402

CKPT = "/tmp/lw_ledgers/checkpoints/lw_wi_final_999_state.npz"
FRAME_H, FRAME_W = 360, 480  # reference corpus geometry (dataset.lua:360-378)

batches = [int(a) for a in sys.argv[1:]] or [8, 32]


def main() -> None:
    opt = Opt(nef=192, ngf=192, ndf=128, nBottleneck=6400,  # reference widths
              frameH=FRAME_H, frameW=FRAME_W,               # train_wholeim_input.lua:40-43
              computeDtype="bfloat16", display=False)
    net = CKPT
    if not os.path.exists(net):
        state = init_train_state(jax.random.PRNGKey(0), opt, "wholeim")
        net = save_checkpoint("/tmp", "bench_wi", 0, jax.device_get(state))
        print(f"no ledger checkpoint; fresh init -> {net}", flush=True)

    rs = np.random.RandomState(0)
    mask = np.zeros((FRAME_H, FRAME_W, 1), np.uint8)
    mask[40:110, 60:220] = 255  # a logo-sized blob inside the 2x2 coverage

    for bs in batches:
        srv = InpaintServer(opt.replace(batchSize=bs), "wholeim", net,
                            device_thread=False)
        try:
            frames = rs.randint(0, 256, (bs, FRAME_H, FRAME_W, 3), np.uint8)
            f = jax.device_put(frames)
            m = jax.device_put(np.broadcast_to(mask, (bs,) + mask.shape).copy())
            zn = jax.device_put(np.zeros((bs, 1, 1, opt.nz), np.float32))
            out = f
            for _ in range(3):  # warmup past compile (ctor warmed zeros-shape)
                out = srv._serve_fn(srv._params, srv._bn, out, m, zn)
            int(jax.device_get(out[0, 0, 0, 0]))
            iters = int(os.environ.get("BENCH_ITERS", "30"))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = srv._serve_fn(srv._params, srv._bn, out, m, zn)
            int(jax.device_get(out[0, 0, 0, 0]))  # flush the serial chain
            dt = time.perf_counter() - t0
            ms_frame = dt / (iters * bs) * 1e3
            print(f"ROW batch={bs} ms/batch={dt / iters * 1e3:.2f} "
                  f"ms/frame={ms_frame:.3f} frames/s={1e3 / ms_frame:.0f}",
                  flush=True)
        finally:
            srv.close()


if __name__ == "__main__":
    main()
