"""conditionAdv learning-dynamics ledger (round 3).

The conditionAdv discriminator head — D conditioned on the (128² ctx,
64² pred) pair via parallel 5x5 convs (train.lua:158-180) — trains on the
real chip since round 2 (scripts/check_condadv_tpu.py verified a step) but
had no learning evidence: the reference forces it off in every M-variant
(train_logo_withmask.lua:43), so no published run exists either.  This run
trains center+conditionAdv on the 2048-texture corpus with a held-out
split, same protocol as scripts/run_center_bigcorpus.py, and evaluates
init/~800/3000-step checkpoints on both splits.

Usage: python scripts/run_condadv_ledger.py
"""
import os
import sys

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)  # ledger_common (the scripts chdir to /tmp)

WORK = "/tmp/bigcorpus"   # shares run_center_bigcorpus.py's corpus
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
          split=80, niter=120, checkpointEvery=32, conditionAdv=True,
          name="ca")

rows = []
run_ledger(opt, "center", ("train", "test"), rows,
           mid_tag="mid", final_tag="final",
           flush=json_flusher("condadv_results.json", rows))
print("ALL-DONE", flush=True)
