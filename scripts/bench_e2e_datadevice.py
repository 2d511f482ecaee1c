"""END-TO-END training throughput with dataDevice=1 (round 5).

bench.py times the fused step in isolation (device-side, synthetic batch
already resident).  This script times the REAL training loop — train/
loop.py with its logging, metric flushes, and per-step dispatch — to show
that with the device-resident corpus (data/device_data.py) the e2e loop
runs at device speed even over this environment's remote-TPU tunnel.

Context (BASELINE.md round 2): with the HOST pipeline the e2e loop here is
transfer-bound at ~680 img/s — each step uploads the uint8 batch over the
tunnel (~110 ms per 3 MB at best, 0.5-1 s/MB when degraded).  With
dataDevice=1 the per-step host→device traffic is ONE int32 seed, so the
only host costs left are dispatch RPCs and the loop's own bookkeeping (a
one-step-late scalar metric fetch per epoch) — both pipelined behind the
donated-state chain.  On a co-located TPU VM the host-pipeline gap mostly
vanishes; over a tunnel it is the difference between 680 and ~20k clips/s.

Protocol: flagship center config (fineSize=128, nBottleneck=4000,
wtl2=0.999, overlapPred=4, bf16 — bench.py's exact model), synthetic
1024-image corpus.  Two dataDevice legs (batch 512 saturating, batch 64 =
the reference's batch) + one short host-pipeline leg (batch 64, nThreads=4)
for the floor contrast.  Each leg times whole epochs between two hard
syncs (float(state.step) — on axon only a value fetch proves completion,
CLAUDE.md), with the first epochs absorbing compile + corpus upload.

Usage: python scripts/bench_e2e_datadevice.py   (real chip; ~15-25 min)
"""
import json
import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))

# DD_E2E_SMOKE=1: tiny widths + corpus on whatever backend is configured —
# validates the script's flow (legs, syncs, flush) without chip time.
SMOKE = os.environ.get("DD_E2E_SMOKE") == "1"

WORK = "/tmp/dd_e2e_smoke" if SMOKE else "/tmp/dd_e2e"
os.makedirs(WORK, exist_ok=True)
os.chdir(WORK)

from video_filler_tpu.data import synthetic  # noqa: E402

N_IMAGES = 32 if SMOKE else 1024
if not os.path.isdir("corpus"):
    synthetic.make_image_folder("corpus", n=N_IMAGES, h=160, w=200)
    print("corpus built", flush=True)

import jax  # noqa: E402

from video_filler_tpu.config import Opt  # noqa: E402
from video_filler_tpu.train.loop import train  # noqa: E402

FLAGSHIP = dict(DATA_ROOT="corpus", fineSize=128, nBottleneck=4000,
                wtl2=0.999, overlapPred=4, computeDtype="bfloat16",
                ntrain=N_IMAGES, manualSeed=222, display=False,
                logEvery=1000, checkpointEvery=9999, name="dd_e2e")
if SMOKE:
    FLAGSHIP.update(nef=8, ngf=8, ndf=8, nBottleneck=64,
                    computeDtype="float32")

rows = []


def _flush():
    tmp = "dd_e2e_results.json.tmp"
    with open(tmp, "w") as f:
        json.dump(rows, f, indent=1)
    os.replace(tmp, "dd_e2e_results.json")


def run_leg(tag, warm_epochs, timed_epochs, **kw):
    opt = Opt(**{**FLAGSHIP, **kw})
    steps_per_epoch = N_IMAGES // opt.batchSize
    t = {}

    def hook(ep, state):
        if ep == warm_epochs or ep == warm_epochs + timed_epochs:
            # Hard sync: the donated-state chain lets the host dispatch
            # far ahead of the device; fetching a live scalar drains the
            # chain up to this epoch's last step.
            float(jax.device_get(state.step))
            t[ep] = time.perf_counter()

    train(opt.replace(niter=warm_epochs + timed_epochs), "center",
          epoch_hook=hook, quiet=True)
    dt = t[warm_epochs + timed_epochs] - t[warm_epochs]
    steps = timed_epochs * steps_per_epoch
    row = {"tag": tag, "batch": opt.batchSize, "steps": steps,
           "seconds": round(dt, 3),
           "ms_per_step": round(1e3 * dt / steps, 3),
           "clips_per_sec": round(steps * opt.batchSize / dt, 1)}
    rows.append(row)
    _flush()
    print("ROW", json.dumps(row), flush=True)
    return row


t_start = time.monotonic()

# Leg 1 (headline): dataDevice, saturating batch.  2 steps/epoch; 50 timed
# epochs = 100 steps.  Epoch boundaries (metric flush = 1 scalar fetch,
# JSONL write) are INCLUDED — this is the loop as users run it.
run_leg("dataDevice", 2, 5 if SMOKE else 50,
        batchSize=16 if SMOKE else 512, dataDevice=True, nThreads=0)

# Leg 2: dataDevice at the reference's batch 64 (16 steps/epoch).
run_leg("dataDevice", 1, 2 if SMOKE else 8,
        batchSize=8 if SMOKE else 64, dataDevice=True, nThreads=0)

# Leg 3: host-pipeline floor at batch 64 — each step uploads ~3 MB over
# the tunnel.  Short (2 timed epochs = 32 steps) and skipped entirely if
# the budget is nearly gone: the tunnel's bulk rate is variable and this
# leg exists only to contrast, not to be precise.
if time.monotonic() - t_start < 1500:
    run_leg("hostPipeline", 1, 2, batchSize=8 if SMOKE else 64, nThreads=4)
else:
    print("SKIP hostPipeline leg (budget)", flush=True)

print("ALL-DONE", len(rows), flush=True)
