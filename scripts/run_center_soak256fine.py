"""center 3k-step FINELY-SCORED run on the 256-texture corpus (round 5).

The unified double-descent reading (BASELINE.md) rests on the 512- and
2048-corpus curves, where the first-descent held-out peak lands at
~1,200 steps on both.  On the 256-texture corpus the whole cycle happens
BEFORE the heldout ledger's first scored point (step 801: already flat),
so the peak's location there is only bounded above — it could sit at
~1.2k like the others (corpus-size-independent peak) or at ~150 (the
refuted linear-scaling prediction, which might still hold for the FIRST
descent even though it fails for the dip).  This run scores every 25
epochs = 75 steps, fine enough to tell those apart.

Protocol: the heldout ledger's exact center config (205 train / 51
held-out of 256 textures, batch 64, 3 steps/epoch, seed 222) with
dataDevice=1 and save-free device-resident scoring, 16-batch ±std.

Usage: python scripts/run_center_soak256fine.py
"""
import os
import sys

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

WORK = "/tmp/heldout3"   # shares the heldout ledger's 256-texture corpus
os.makedirs(WORK, exist_ok=True)
os.chdir(WORK)

from video_filler_tpu.data import synthetic  # noqa: E402

if not os.path.isdir("images"):
    synthetic.make_image_folder("images", n=256, h=160, w=200, seed=0)
    print("corpus built: 256 textures", flush=True)

from ledger_common import json_flusher, run_ledger  # noqa: E402
from video_filler_tpu.config import Opt  # noqa: E402

rows = []
_flush = json_flusher("center_soak256fine_results.json", rows)

run_ledger(Opt(DATA_ROOT="images", batchSize=64, overlapPred=4,
               loadSize=150, fineSize=128, nBottleneck=4000, wtl2=0.999,
               ntrain=256, nThreads=2, manualSeed=222, display=False,
               logEvery=300, split=80, niter=1000, checkpointEvery=9999,
               name="c_soak256f", dataDevice=True),
           "center", ("train", "test"), rows,
           mid_tag="step1500", final_tag="step3000",
           max_steps=3000, save=False, score_every=25, flush=_flush)

print("ALL-DONE", len(rows), flush=True)
