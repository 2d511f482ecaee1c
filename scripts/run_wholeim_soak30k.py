"""wholeim 30k-step soak — find the plateau (round 5).

The completed 10k soak (scripts/run_wholeim_soak.py) shows held-out
hole-L2 still falling at step 10,002 (0.080 -> 0.073 over the last 1,000
steps): wholeim is under-trained even at 10k, consistent with the
reference's 500-FULL-epoch budget (train_wholeim_input.lua:46).  This run
triples the horizon to 30,000 steps (5,000 epochs of the same 4-video
corpus) to find where the curve actually flattens — or show it still
hasn't.  Same protocol: ``dataDevice=1`` (HBM-resident corpus, in-jit
batch synthesis — no per-step host traffic, so the axon-transport leak
that capped round-4 runs never engages), save-free device-resident
scoring every 500 epochs (3,000 steps), 16-batch ±std eval.

Usage: python scripts/run_wholeim_soak30k.py
"""
import os
import sys

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

WORK = "/tmp/lw_ledgers"   # shares the ledger run's corpus
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
_flush = json_flusher("wholeim_soak30k_results.json", rows)

run_ledger(Opt(DATA_ROOT="corpus", maskName="mask.png", loadSize=180,
               batchSize=32, nef=192, ngf=192, ndf=128, nBottleneck=6400,
               wtl2=0.999, weight_nomask=0.05, ntrain=192, nThreads=2,
               manualSeed=222, display=False, logEvery=3000, split=80,
               niter=5000, checkpointEvery=9999, name="wi_soak30",
               dataDevice=True),
           "wholeim", ("train", "test"), rows,
           mid_tag="step3000", final_tag="step30000",
           max_steps=30000, save=False, score_every=500, flush=_flush)

print("ALL-DONE", len(rows), flush=True)
