"""Center-regime generalization vs corpus size (round-3 follow-up).

The held-out ledger (BASELINE.md) showed center@3000 steps reaching 25.8 dB
on the train split but only 16.5 dB held-out on a 256-texture corpus —
memorization of a tiny corpus, not a framework property.  This run repeats
the identical protocol on an 8x corpus (2048 textures, split=80 -> 1638
train / 410 held-out) to show the train/held-out gap closing with data,
i.e. the regime learns the inpainting transform when it cannot memorize.

Protocol: same as scripts/run_heldout_ledgers.py (seed 222, loadSize=150,
nB=4000, batch 64, eval n_batches=4, init/~800/3000-step checkpoints on
both splits).  ntrain=1638 -> 25 steps/epoch at batch 64; niter=120,
checkpointEvery=32 lands ~step 800 and step 3000.

Usage: python scripts/run_center_bigcorpus.py  (cwd anywhere; builds
/tmp/bigcorpus once, runs on the default backend — the real chip).
"""
import os
import sys

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)  # ledger_common (the scripts chdir to /tmp)

WORK = "/tmp/bigcorpus"
os.makedirs(WORK, exist_ok=True)
os.chdir(WORK)

from video_filler_tpu.data import synthetic  # noqa: E402

if not os.path.isdir("images"):
    synthetic.make_image_folder("images", n=2048, h=160, w=200, seed=0)
    print("corpus built: 2048 textures", flush=True)

from ledger_common import json_flusher, run_ledger  # noqa: E402
from video_filler_tpu.config import Opt  # noqa: E402

opt = Opt(DATA_ROOT="images", batchSize=64, overlapPred=4, loadSize=150,
          fineSize=128, nBottleneck=4000, wtl2=0.999, ntrain=1664,
          nThreads=2, manualSeed=222, display=False, logEvery=400,
          split=80, niter=120, checkpointEvery=32, name="bc")
# split=80 of 2048 -> 1638 train images -> 25 steps/epoch at batch 64;
# niter=120 -> 3000 steps, checkpointEvery=32 -> a step-800 checkpoint.

rows = []
run_ledger(opt, "center", ("train", "test"), rows,
           mid_tag="mid", final_tag="final",
           flush=json_flusher("bigcorpus_results.json", rows))
print("ALL-DONE", flush=True)
