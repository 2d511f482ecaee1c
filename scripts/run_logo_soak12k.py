"""logo 12.5k-step soak (round 5) — resolve the post-peak behavior.

The 7.5k logo soak (`scripts/run_logo_soak.py`, logo_soak_results.json)
found held-out peaking at 24.02 dB @step 6804 and then BOTH splits
regressing ~1 dB by 7,500 — the curve ends on a down-tick, consistent
with the live-adversarial-game oscillation mechanism (errD oscillates
0.02–1.7 throughout; at train hole-L2 0.0087 the 0.001-weighted errG
spikes are the same order as the L2 term) but not yet distinguishing
bounded oscillation from persistent regression.  This run extends the
identical trajectory (same seed 222 — the first 7,500 steps replicate)
to 12,504 steps at 504-step scoring resolution: if quality recovers
toward the peak band it is oscillation; if it keeps falling it is
video-style regression.

Protocol: logo_split recipe, dataDevice=1, save-free device-resident
scoring every 42 epochs (= 504 steps at the clamped 12 steps/epoch),
16-batch ±std.  niter=1042 -> 12,504 steps.

Usage: python scripts/run_logo_soak12k.py
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
_flush = json_flusher("logo_soak12k_results.json", rows)

run_ledger(Opt(DATA_ROOT="pairs/masked", DATA_ROOT_GT="pairs/gt_pairs",
               batchSize=64, loadSize=150, fineSize=128,
               nBottleneck=4000, wtl2=0.999, ntrain=1024, nThreads=2,
               manualSeed=222, display=False, logEvery=1200, split=80,
               niter=1042, checkpointEvery=9999, name="lg_soak12k",
               dataDevice=True),
           "logo", ("train", "test"), rows,
           mid_tag="step6048", final_tag="step12504",
           max_steps=12504, save=False, score_every=42, flush=_flush)

print("ALL-DONE", len(rows), flush=True)
