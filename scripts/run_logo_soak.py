"""logo 10k-step soak (round 5) — the long-horizon curve for the paired model.

Completes "every regime family has a long-horizon soak": the logo
(masked/gt paired folders, train_logo_withmask.lua) held-out ledger stops
at step 2,256 (23.48 train / 22.25 held-out dB, logo_split_results.json)
with the gap still ~1.2 dB — is the model still learning, memorizing the
819 train pairs, or plateaued?  Extends the round-4 logo_split recipe
(scripts/run_logo_wholeim_ledgers.py logo_split: split=80, seed 222,
batch 64) with ``dataDevice=1`` (HBM-resident pairs, in-jit batch
synthesis — avoids the axon transport's ~27 MB/step host leak) and
save-free device-resident scoring every 63 epochs (756 steps), 16-batch
±std.  NOTE: 819 train pairs -> 12 steps/epoch (loop.py clamps ntrain to
the split size), so niter=625 ends at step 7,500, not the 10,000 this
run was planned as; run_ledger now tags the final row by the real step.

Usage: python scripts/run_logo_soak.py
"""
import os
import sys

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

WORK = "/tmp/lw_ledgers"   # shares the logo ledger's paired corpus
os.makedirs(WORK, exist_ok=True)
os.chdir(WORK)

from video_filler_tpu.data import synthetic  # noqa: E402

if not os.path.isdir("pairs"):
    synthetic.make_paired_folders("pairs", n=1024, h=160, w=200)
    print("pairs built", flush=True)

from ledger_common import json_flusher, run_ledger  # noqa: E402
from video_filler_tpu.config import Opt  # noqa: E402

rows = []
_flush = json_flusher("logo_soak_results.json", rows)

# Same recipe as logo_split (819 train pairs -> 12 steps/epoch at
# batch 64); niter=625 -> 7,500 steps.
run_ledger(Opt(DATA_ROOT="pairs/masked", DATA_ROOT_GT="pairs/gt_pairs",
               batchSize=64, loadSize=150, fineSize=128,
               nBottleneck=4000, wtl2=0.999, ntrain=1024, nThreads=2,
               manualSeed=222, display=False, logEvery=1000, split=80,
               niter=625, checkpointEvery=9999, name="lg_soak",
               dataDevice=True),
           "logo", ("train", "test"), rows,
           mid_tag="step3024", final_tag="step7500",
           max_steps=10000, save=False, score_every=63, flush=_flush)

print("ALL-DONE", len(rows), flush=True)
