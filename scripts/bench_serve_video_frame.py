"""Device-side ms/frame for VIDEO whole-frame tiled serving (round 5).

VERDICT r4 item 3: serve.py now serves the reference's flagship inference
(test_vid_wholeim.lua:159-220) — the video G tiled over a fineSize-padded
whole frame with the vflip-top-tiles trick and the mask-only composite.
This times the server's own jitted ``serve_fn`` at the reference's
360x480 frame geometry (pads to 384x512 = 12 tiles/frame), flagship model
(fineSize 128, nBottleneck 4000, predLen 4 channel-folded), excluding
HTTP and tunnel transfer:

* inputs are device_put ONCE; iterations chain the uint8 output frame back
  in as the next input (same shape), so execution is serial and un-elidable;
* timing ends with a scalar element fetch (axon's block_until_ready does
  not wait for remote execution — CLAUDE.md).

Each wire item is a CLIP of predLen frames (channel-folded), so ms/frame
= ms/item / predLen.  A final row times the netI initializer cascade
(withInit=1 — a second G-sized forward per tile batch).

Usage: timeout 900 python scripts/bench_serve_video_frame.py [batch ...]
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

FRAME_H, FRAME_W = 360, 480  # reference corpus geometry (dataset.lua:360-378)
PRED_LEN = 4

batches = [int(a) for a in sys.argv[1:]] or [4, 8]


def _time_rows(srv, bs, tag, extra=""):
    rs = np.random.RandomState(0)
    mask = np.zeros((FRAME_H, FRAME_W, 1), np.uint8)
    mask[20:80, 30:150] = 255   # a logo-sized top-corner blob (the vflip
    #                             trick's reason to exist)
    clips = rs.randint(0, 256, (bs, FRAME_H, FRAME_W, 3 * PRED_LEN),
                       np.uint8)
    f = jax.device_put(clips)
    m = jax.device_put(np.broadcast_to(mask, (bs,) + mask.shape).copy())
    zn = jax.device_put(np.zeros((bs, 1, 1, srv.nz), np.float32))
    out = f
    for _ in range(3):   # warmup past compile (ctor warmed zeros-shape)
        out = srv._serve_fn(srv._params, srv._bn, out, m, zn,
                            *srv._extra_args)
    int(jax.device_get(out[0, 0, 0, 0]))
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = srv._serve_fn(srv._params, srv._bn, out, m, zn,
                            *srv._extra_args)
    int(jax.device_get(out[0, 0, 0, 0]))  # flush the serial chain
    dt = time.perf_counter() - t0
    ms_item = dt / (iters * bs) * 1e3
    ms_frame = ms_item / PRED_LEN
    print(f"ROW {tag} batch={bs}{extra} ms/batch={dt / iters * 1e3:.2f} "
          f"ms/clip={ms_item:.3f} ms/frame={ms_frame:.3f} "
          f"frames/s={1e3 / ms_frame:.0f}", flush=True)


def main() -> None:
    opt = Opt(nBottleneck=4000, predLen=PRED_LEN,   # flagship video model
              frameH=FRAME_H, frameW=FRAME_W,       # (train_vid_weighted.lua)
              computeDtype="bfloat16", display=False)
    state = init_train_state(jax.random.PRNGKey(0), opt, "video")
    net = save_checkpoint("/tmp", "bench_vf", 0, jax.device_get(state))
    print(f"fresh-init weights -> {net} (timing is value-independent)",
          flush=True)

    for bs in batches:
        srv = InpaintServer(opt.replace(batchSize=bs), "video", net,
                            device_thread=False)
        try:
            _time_rows(srv, bs, "plain")
        finally:
            srv.close()

    # netI cascade: a second G-sized forward per tile batch
    bs = batches[-1]
    srv = InpaintServer(opt.replace(batchSize=bs, withInit=True,
                                    initName=net), "video", net,
                        device_thread=False)
    try:
        _time_rows(srv, bs, "withInit", extra=" cascade")
    finally:
        srv.close()
    print("ALL-DONE", flush=True)


if __name__ == "__main__":
    main()
