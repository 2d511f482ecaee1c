"""noiseGen learning-dynamics ledger (round 5, VERDICT r4 item 4).

noiseGen — the bottleneck join that concatenates an nz-channel noise
projection into G's bottleneck (train.lua:107-150) — is the last model
variant without on-chip learning evidence: it is compile-, dryrun-,
serve- and unit-tested, but (like conditionAdv before round 3) the
reference never shipped a run with it on.  This trains center+noiseGen on
the 2048-texture corpus with a held-out split, same 16-batch +/-std
protocol as scripts/run_condadv_ledger.py, and evaluates init/~800/3000-
step checkpoints on both splits.

Usage: python scripts/run_noisegen_ledger.py
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
          split=80, niter=120, checkpointEvery=32, noiseGen=True,
          name="ng")

rows = []
run_ledger(opt, "center", ("train", "test"), rows,
           mid_tag="mid", final_tag="final",
           flush=json_flusher("noisegen_results.json", rows))
print("ALL-DONE", flush=True)
