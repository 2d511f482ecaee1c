"""center 10k-step soak on the 2048-texture corpus (round 5).

The corpus-size control (scripts/run_center_bigcorpus.py) shows center
generalizing on the 8x corpus at 3,000 steps (train/held-out within
~0.2 dB).  This run extends the same configuration to ~10k steps to
answer the long-horizon question the wholeim soak answered for its
regime: does held-out keep improving with more optimization given enough
data, or does the 2048-texture corpus eventually memorize too (the
256-texture run's held-out hole-L2 FLATTENS at ~0.095 by 800 steps while
train keeps falling — the memorization signature)?

Protocol: ``dataDevice=1`` (HBM-resident corpus, in-jit batch synthesis),
save-free device-resident scoring every 50 epochs (1,250 steps),
16-batch ±std eval, seed 222.  1638 train images -> 25 steps/epoch
(loop.py clamps ntrain to the split size); niter=385 -> 9,625 steps.

Usage: python scripts/run_center_soak.py
"""
import os
import sys

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

WORK = "/tmp/bigcorpus"   # shares run_center_bigcorpus.py's corpus
os.makedirs(WORK, exist_ok=True)
os.chdir(WORK)

from video_filler_tpu.data import synthetic  # noqa: E402

if not os.path.isdir("images"):
    synthetic.make_image_folder("images", n=2048, h=160, w=200, seed=0)
    print("corpus built: 2048 textures", flush=True)

from ledger_common import json_flusher, run_ledger  # noqa: E402
from video_filler_tpu.config import Opt  # noqa: E402

rows = []
_flush = json_flusher("center_soak_results.json", rows)

run_ledger(Opt(DATA_ROOT="images", batchSize=64, overlapPred=4,
               loadSize=150, fineSize=128, nBottleneck=4000, wtl2=0.999,
               ntrain=1664, nThreads=2, manualSeed=222, display=False,
               logEvery=2600, split=80, niter=385, checkpointEvery=9999,
               name="c_soak", dataDevice=True),
           "center", ("train", "test"), rows,
           mid_tag="step3000", final_tag="step9625",
           max_steps=10010, save=False, score_every=50, flush=_flush)

print("ALL-DONE", len(rows), flush=True)
