"""Throughput benchmark — prints ONE JSON line.

Metric: training clips/sec/chip on the canonical center-mask model
(README.md:78: fineSize=128, nBottleneck=4000, wtl2=0.999, overlapPred=4) at
the chip's saturating batch.  Baseline: the reference's ~1.455 s/batch@64 ≈
44 images/s on its single CUDA GPU (training_logs:1, BASELINE.md).

Measures the FULL fused path the way training runs it: uint8 batch → on-device
preprocess (flip/normalize/center-mask) → G fwd + 2 D fwd → joint backward →
two Adam updates, as one donated jit; synthetic uint8 input isolates device
throughput from disk (the reference's number is data-bound — ours must not be).

Batch choice: the per-step HBM cost of the optimizer state + weights is
batch-independent, so clips/s rises with batch until the activation traffic
saturates bandwidth — measured on v5e: 10.0k @64, 16.6k @128, 21.4k @256,
23.4k @512 (plateau; BASELINE.md scaling table).  The benchmark reports the
saturated batch-512 figure; batch-64 (the reference's batch) remains in the
ledger.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMAGES_PER_SEC = 44.0

# Roofline self-audit constants (BASELINE.md round-2 analysis): the fused
# batch-64 center step moves ~3.3 GB of unique HBM traffic (weights + grads
# + f32 Adam state + activations; XLA cost-analysis reports 6.7 GB but
# overcounts fusion operands), and a pure streaming kernel measures
# 552 GB/s on this chip.  Emitting achieved GB/s per round makes the
# "bandwidth-bound within ~15% of roofline" claim auditable from the
# artifact alone (VERDICT r4 item 5) instead of resting on round-2 prose.
STEP_UNIQUE_TRAFFIC_GB_B64 = 3.3
MEASURED_STREAMING_GBPS = 552.0


def _probe_backend(probe_seconds: int = 30, budget_seconds: int = 360) -> None:
    """Fail fast if the device backend never comes up — but RETRY first.

    When the axon tunnel is down, backend init blocks FOREVER inside the
    plugin's C init (not an error, and it holds the GIL — SIGALRM's
    Python handler never runs; observed round 3: every client hung at
    jax.devices() until the relay was restored).  Probe in a SUBPROCESS
    with a hard timeout, so the hang becomes a loud exit and the driver
    records a failure instead of timing out the whole round.

    Round 3's single 180s probe nulled the round's perf artifact on a
    transient outage (BENCH_r03.json rc=75) while 400s of the driver's
    580s window went unused.  Now: short probes in a loop, spending at
    most ``budget_seconds`` of the window, so a flapping tunnel gets
    ~12 chances instead of 1 while still leaving >200s for warmup+timing
    (warm-cache compile ~20s; 100 timed iters ~2s).  Only the probes are
    bounded: the main process's first compile and first execution of a
    big program are legitimately slow and must not be killed."""
    import subprocess
    import sys

    deadline = time.monotonic() + budget_seconds
    attempt = 0
    while True:
        attempt += 1
        try:
            subprocess.run(
                [sys.executable, "-c",
                 # Honor JAX_PLATFORMS via config.update: the env var alone
                 # does not keep the axon plugin from engaging while the
                 # tunnel is down (CLAUDE.md), which would hang a CPU probe.
                 "import os, jax\n"
                 "p = os.environ.get('JAX_PLATFORMS', '').strip().lower()\n"
                 "if p: jax.config.update('jax_platforms', p)\n"
                 "import jax.numpy as jnp\n"
                 "assert float(jnp.arange(4.0).sum()) == 6.0"],
                timeout=probe_seconds, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            return
        except subprocess.TimeoutExpired:
            reason = f"probe {attempt} timed out after {probe_seconds}s"
        except subprocess.CalledProcessError as e:
            reason = f"probe {attempt} failed (rc={e.returncode})"
        remaining = deadline - time.monotonic()
        if remaining < probe_seconds:
            print(f"bench: device backend unreachable for {budget_seconds}s "
                  f"across {attempt} probes (axon tunnel down?) — aborting "
                  "instead of hanging",
                  file=sys.stderr, flush=True)
            sys.exit(75)
        print(f"bench: {reason}; retrying ({remaining:.0f}s budget left)",
              file=sys.stderr, flush=True)
        # A failed-fast probe (rc!=0 in <30s) should not spin: pace retries.
        time.sleep(min(10.0, max(0.0, remaining - probe_seconds)))


def _time_step(opt, iters: int = 100) -> float:
    """Seconds/step of the fused train step at ``opt.batchSize``."""
    from video_filler_tpu.train import (init_train_state, make_preprocess,
                                        make_train_step)

    state = init_train_state(jax.random.PRNGKey(0), opt, "center")
    preprocess = make_preprocess(opt, "center")
    train_step = make_train_step(opt, "center")

    def _fused(state, raw, step_seed):
        # Keys derive INSIDE the jit from a host integer — an eager
        # jax.random.split per step is a device round-trip (the loop's
        # invariant, train/loop.py; CLAUDE.md).
        k_prep, k_step = jax.random.split(jax.random.PRNGKey(step_seed))
        batch = preprocess({"raw": raw}, k_prep)
        return train_step(state, batch, k_step)

    fused = jax.jit(_fused, donate_argnums=0)

    rs = np.random.RandomState(0)
    raw = jnp.asarray(rs.randint(0, 256, (opt.batchSize, 128, 128, 3),
                                 dtype=np.uint8))

    # warmup (compile + stabilize); the scalar fetch forces real completion —
    # on the axon remote backend block_until_ready alone does NOT wait for
    # remote execution, so timing must end with a value materialization.
    for i in range(3):
        state, metrics = fused(state, raw, np.int32(i))
    float(metrics["errD"])

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = fused(state, raw, np.int32(100 + i))
    # steps chain through the donated state, so execution is serial; this one
    # fetch flushes the entire chain.
    float(metrics["errD"])
    return (time.perf_counter() - t0) / iters


def main() -> None:
    from video_filler_tpu.config import Opt

    t_start = time.monotonic()
    _probe_backend()

    opt = Opt(batchSize=512, fineSize=128, nBottleneck=4000, wtl2=0.999,
              overlapPred=4, computeDtype="bfloat16")
    sec_512 = _time_step(opt)
    clips_per_sec = opt.batchSize / sec_512

    # Roofline leg: the ~3.3 GB unique-traffic model is anchored at BATCH
    # 64 (the reference's batch; BASELINE.md round-2 ablations), so the
    # achieved-GB/s audit times that step too.  It costs a second compile
    # + first-execution upload over the tunnel, so it runs only if the
    # headline capture left enough of the driver's ~580s window — the
    # batch-512 number must never be starved by the audit.
    hbm_gbps = pct_roofline = ms64 = None
    if time.monotonic() - t_start < 300:
        sec_64 = _time_step(opt.replace(batchSize=64))
        ms64 = round(sec_64 * 1e3, 3)
        hbm_gbps = round(STEP_UNIQUE_TRAFFIC_GB_B64 / sec_64, 1)
        pct_roofline = round(100.0 * hbm_gbps / MEASURED_STREAMING_GBPS, 1)

    print(json.dumps({
        "metric": "train_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s/chip (fineSize=128, batch=512 saturating, "
                "center regime)",
        "vs_baseline": round(clips_per_sec / BASELINE_IMAGES_PER_SEC, 2),
        "batch64_ms_per_step": ms64,
        "hbm_gbps_achieved": hbm_gbps,
        "pct_of_streaming_roofline": pct_roofline,
    }))


if __name__ == "__main__":
    main()
