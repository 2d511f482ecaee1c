"""center 10k-step soak on a 512-texture corpus (round 5, third point).

The memorization-onset story currently rests on two corpus sizes:
256 textures (held-out hole-L2 flattens by ~800 steps while train keeps
falling) and 2048 textures (held-out PSNR peaks @~1250 steps, then a slow
monotone drift down — `scripts/run_center_soak.py`).  This run adds the
midpoint, 512 textures (2x the small corpus), under the identical
protocol, so the onset-vs-corpus-size relation becomes a 3-point curve
instead of a ratio between two ends.

Protocol: identical to run_center_soak.py (dataDevice=1 HBM-resident
corpus + in-jit batch synthesis, save-free device-resident scoring,
16-batch ±std eval, seed 222).  split=80 of 512 -> 409 train / 103
held-out; ntrain=384 -> 6 steps/epoch at batch 64; scored every 50
epochs = 300 steps (finer than the 2048 run's 1,300 because the expected
peak is earlier); niter=1667 -> 10,002 steps.

Usage: python scripts/run_center_soak512.py
"""
import os
import sys

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

WORK = "/tmp/midcorpus"
os.makedirs(WORK, exist_ok=True)
os.chdir(WORK)

from video_filler_tpu.data import synthetic  # noqa: E402

if not os.path.isdir("images"):
    synthetic.make_image_folder("images", n=512, h=160, w=200, seed=0)
    print("corpus built: 512 textures", flush=True)

from ledger_common import json_flusher, run_ledger  # noqa: E402
from video_filler_tpu.config import Opt  # noqa: E402

rows = []
_flush = json_flusher("center_soak512_results.json", rows)

run_ledger(Opt(DATA_ROOT="images", batchSize=64, overlapPred=4,
               loadSize=150, fineSize=128, nBottleneck=4000, wtl2=0.999,
               ntrain=384, nThreads=2, manualSeed=222, display=False,
               logEvery=1200, split=80, niter=1667, checkpointEvery=9999,
               name="c_soak512", dataDevice=True),
           "center", ("train", "test"), rows,
           mid_tag="step3000", final_tag="step10002",
           max_steps=10002, save=False, score_every=50, flush=_flush)

print("ALL-DONE", len(rows), flush=True)
