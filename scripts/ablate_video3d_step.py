"""Step-level ablations for the video3d per-FLOP gap attribution.

scripts/profile_video3d.py localized the only per-FLOP deficit vs the 2D
channel-folded path to the (T,4,4)-valid bottleneck matmul pair — every
spatial (3,4,4) conv is MORE efficient per FLOP than its 2D reference.
The bottleneck pair's weights are 4x the 2D regime's (the T axis folds
into K: (T*4*4*512)x4000 in AND out), so the f32 Adam state on them is
4x the optimizer traffic of the flagship 2D regime.  This script measures
the full fused video3d train step at training batches under:

  - f32 Adam (default)              — baseline
  - adamMomentsBf16=1               — halves moment traffic on the 262M
                                      bottleneck params (opt-in flag)

Timing follows the loop/bench rule: donated-state chaining + a final
float() fetch (axon block_until_ready does not wait; CLAUDE.md).

Usage: timeout 580 python scripts/ablate_video3d_step.py [batch ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from video_filler_tpu.config import Opt
from video_filler_tpu.train import (init_train_state, make_preprocess,
                                    make_train_step)

ITERS = 40


def bench_step(opt: Opt) -> float:
    """Seconds per fused video3d train step (preprocess + G/D + updates)."""
    state = init_train_state(jax.random.PRNGKey(0), opt, "video3d")
    preprocess = make_preprocess(opt, "video3d")
    train_step = make_train_step(opt, "video3d")

    def _fused(state, raw, mask, step_seed):
        k_prep, k_step = jax.random.split(jax.random.PRNGKey(step_seed))
        batch = preprocess({"raw": raw, "mask": mask}, k_prep)
        return train_step(state, batch, k_step)

    fused = jax.jit(_fused, donate_argnums=0)

    rs = np.random.RandomState(0)
    b, t, s = opt.batchSize, opt.predLen, opt.fineSize
    # Host-format video batch: channel-folded uint8 frames + (B,H,W,1) mask
    # (the video3d preprocess unfolds T on device, step.py make_preprocess).
    raw = jnp.asarray(rs.randint(0, 256, (b, s, s, t * 3), dtype=np.uint8))
    q = s // 3
    mask = jnp.zeros((b, s, s, 1), jnp.float32).at[:, q:2 * q, q:2 * q].set(1.0)

    for i in range(3):
        state, metrics = fused(state, raw, mask, np.int32(i))
    float(metrics["errD"])
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = fused(state, raw, mask, np.int32(100 + i))
    float(metrics["errD"])
    return (time.perf_counter() - t0) / ITERS


def main() -> None:
    global ITERS
    batches = [int(a) for a in sys.argv[1:]] or [32, 128]
    smoke = os.environ.get("VF_SMOKE") == "1"
    if smoke:
        ITERS = 2
    for b in batches:
        base = Opt(batchSize=b, fineSize=128, nBottleneck=4000, predLen=4,
                   wtl2=0.999, weight_nomask=0.05, video3dLevels=5,
                   computeDtype="bfloat16")
        if smoke:
            base = base.replace(fineSize=32, nBottleneck=64, nef=8, ngf=8,
                                ndf=8, video3dLevels=3,
                                computeDtype="float32")
        for tag, opt in [("f32 Adam", base),
                         ("bf16 moments", base.replace(adamMomentsBf16=True))]:
            dt = bench_step(opt)
            print(f"video3d b={b:4d} {tag:14s} {dt * 1e3:8.2f} ms/step  "
                  f"{b / dt:8.1f} clips/s", flush=True)


if __name__ == "__main__":
    main()
