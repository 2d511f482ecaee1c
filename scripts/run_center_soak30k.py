"""center 30k-step soak on the 2048-texture corpus (round 5, drift endgame).

The 10k soak (scripts/run_center_soak.py) found held-out PSNR peaking at
~1250 steps and then drifting DOWN monotonically to 9,625.  The
512-texture midpoint (run_center_soak512.py) then showed its same-step
onset dip RECOVERING — held-out surpassed the early peak by +0.5 dB at
8,700.  Open question this run answers: is the 2048 corpus's decline
terminal (video-style) or a slow version of the 512 run's transient —
does held-out turn around somewhere past 10k?  Either answer completes
the three-corpus late-training story in BASELINE.md.

Protocol: identical to run_center_soak.py (dataDevice=1 HBM-resident
corpus + in-jit batch synthesis, save-free device-resident scoring every
50 epochs = 1,250 steps, 16-batch ±std eval, seed 222; independent run,
fresh RNG stream over the same corpus) extended to niter=1200 ->
30,000 steps at 25 steps/epoch.

Usage: python scripts/run_center_soak30k.py
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
_flush = json_flusher("center_soak30k_results.json", rows)

run_ledger(Opt(DATA_ROOT="images", batchSize=64, overlapPred=4,
               loadSize=150, fineSize=128, nBottleneck=4000, wtl2=0.999,
               ntrain=1664, nThreads=2, manualSeed=222, display=False,
               logEvery=2600, split=80, niter=1200, checkpointEvery=9999,
               name="c_soak30k", dataDevice=True),
           "center", ("train", "test"), rows,
           mid_tag="step9625", final_tag="step30000",
           max_steps=30000, save=False, score_every=50, flush=_flush)

print("ALL-DONE", len(rows), flush=True)
