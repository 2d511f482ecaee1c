"""video3d 30k-step soak (round 5) — find the 3D model's plateau.

The 10k soak (scripts/run_video3d_soak.py) ended with held-out hole-L2
still FALLING (0.0155 @10k, monotone, no overtraining despite the D
collapsing) — the one regime family whose long-horizon curve has an open
end.  wholeim needed 3x the horizon to reveal its plateau (@~18k,
run_wholeim_soak30k.py); this run gives video3d the same treatment on
the same 4-video corpus: does it plateau, and does the collapsed-D
adversarial gradient ever start degrading held-out quality the way it
does for the 2D video regime past ~3k?

Protocol: identical to run_video3d_soak.py (dataDevice=1 HBM-resident
corpus + in-jit batch synthesis, save-free device-resident scoring,
16-batch ±std eval, seed 222; independent RNG stream) with niter=5000 ->
30,000 steps at 6 steps/epoch, scored every 500 epochs (3,000 steps).

Usage: python scripts/run_video3d_soak30k.py
"""
import os
import sys

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

WORK = "/tmp/heldout3"   # shares the heldout ledger's corpus
os.makedirs(WORK, exist_ok=True)
os.chdir(WORK)

from video_filler_tpu.data import synthetic  # noqa: E402

if not os.path.isdir("corpus"):
    synthetic.make_video_corpus("corpus", n_videos=4, frames=64,
                                h=180, w=240)
    synthetic.make_mask_png("mask.png", h=180, w=240)
    print("corpus built", flush=True)

from ledger_common import json_flusher, run_ledger  # noqa: E402
from video_filler_tpu.config import Opt  # noqa: E402

rows = []
_flush = json_flusher("video3d_soak30k_results.json", rows)

run_ledger(Opt(DATA_ROOT="corpus", maskName="mask.png", batchSize=32,
               predLen=4, weight_nomask=0.05, loadSize=150, fineSize=128,
               nBottleneck=4000, wtl2=0.999, ntrain=256, nThreads=2,
               manualSeed=222, display=False, logEvery=3000, split=80,
               niter=5000, checkpointEvery=9999, name="v3_soak30k",
               dataDevice=True),
           "video3d", ("train", "test"), rows,
           mid_tag="step10002", final_tag="step30000",
           max_steps=30000, save=False, score_every=500, flush=_flush)

print("ALL-DONE", len(rows), flush=True)
