"""Learning-dynamics ledgers for the two remaining regimes (round 3).

center/video/video3d (+conditionAdv) have on-chip convergence ledgers;
logo and wholeim only had e2e smoke tests.  Same protocol as the other
ledgers (seed 222, eval n_batches=4, init/~800/3000-step checkpoints):

* wholeim — 27-channel 3x3 patch-array input predicting the 2x2 corner
  patches (train_wholeim_input.lua) on a 4-video synthetic corpus with
  split=80: train AND held-out tail metrics.
* logo — masked/gt paired folders (train_logo_withmask.lua).  Train-set
  metrics only: the paired dataset has no split, faithful to
  data/dataset_logo.lua (pipeline.make_sampler enforces this).

Usage: python scripts/run_logo_wholeim_ledgers.py [wholeim|logo|logo_split]

``logo_split`` (round 4) retrains logo with split=80 so BASELINE.md's logo
row gains a held-out column (VERDICT r3 item 3).
"""
import os
import sys

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)  # ledger_common (the scripts chdir to /tmp)

WORK = "/tmp/lw_ledgers"
os.makedirs(WORK, exist_ok=True)
os.chdir(WORK)

from video_filler_tpu.data import synthetic  # noqa: E402

if not os.path.isdir("corpus"):
    synthetic.make_video_corpus("corpus", n_videos=4, frames=64,
                                h=180, w=240)
    synthetic.make_mask_png("mask.png", h=180, w=240)
    print("corpus built", flush=True)
if not os.path.isdir("pairs"):
    synthetic.make_paired_folders("pairs", n=1024, h=160, w=200)
    print("pairs built", flush=True)

from ledger_common import json_flusher, run_ledger  # noqa: E402
from video_filler_tpu.config import Opt  # noqa: E402

which = sys.argv[1] if len(sys.argv) > 1 else "both"

RESULTS = []
# Per-MODE output file (round 4): a later `wholeim` re-run must not clobber
# the `logo_split` rows; every row is flushed as it lands (tunnel flaps).
OUT = f"lw_results_{which}.json" if which != "both" else "lw_results.json"
_flush = json_flusher(OUT, RESULTS)


def run(regime, opt, spe, splits):
    # ``spe`` must be the CLAMPED steps/epoch (min(split size, ntrain)
    # // batch — loop.py); both tags are computed from it so a wrong spe
    # mislabels rows (the round-4 logo_split lesson).
    run_ledger(opt, regime, splits, RESULTS,
               mid_tag=f"step{opt.checkpointEvery * spe}",
               final_tag=f"step{opt.niter * spe}", flush=_flush)

if which in ("wholeim", "both"):
    # Reference widths (train_wholeim_input.lua:40-43).  4x64 frames,
    # split=80 -> 204 train frames; ntrain=192 at batch 32 -> 6 steps/epoch;
    # niter=500 -> 3000 steps, checkpointEvery=133 -> step 798.
    run("wholeim",
        Opt(DATA_ROOT="corpus", maskName="mask.png", loadSize=180,
            batchSize=32, nef=192, ngf=192, ndf=128, nBottleneck=6400,
            wtl2=0.999, weight_nomask=0.05, ntrain=192, nThreads=2,
            manualSeed=222, display=False, logEvery=400, split=80,
            niter=500, checkpointEvery=133, name="lw_wi"),
        spe=6, splits=("train", "test"))

if which in ("logo", "both"):
    # 1024 pairs; ntrain=1024 at batch 64 -> 16 steps/epoch; niter=188
    # -> 3008 steps, checkpointEvery=50 -> step 800.
    run("logo",
        Opt(DATA_ROOT="pairs/masked", DATA_ROOT_GT="pairs/gt_pairs",
            batchSize=64, loadSize=150, fineSize=128,
            nBottleneck=4000, wtl2=0.999, ntrain=1024, nThreads=2,
            manualSeed=222, display=False, logEvery=400,
            niter=188, checkpointEvery=50, name="lw_lg"),
        spe=16, splits=("train",))

if which == "logo_split":
    # Round 4 (VERDICT r3 item 3): same logo recipe but split=80 — the
    # PairedIndex reserves the sorted tail 205 of 1024 pairs as held-out
    # (an upgrade over dataset_logo.lua:354-365's split-blind sampler) —
    # and the ledger scores BOTH splits.  NOTE (round-5 correction): the
    # loop clamps ntrain to the 819-pair train split -> 12 steps/epoch,
    # not 16, so epochs 50/188 are steps 600/2256 (the round-4 run's rows
    # were relabeled accordingly in logo_split_results.json).
    run("logo",
        Opt(DATA_ROOT="pairs/masked", DATA_ROOT_GT="pairs/gt_pairs",
            batchSize=64, loadSize=150, fineSize=128,
            nBottleneck=4000, wtl2=0.999, ntrain=1024, nThreads=2,
            manualSeed=222, display=False, logEvery=400, split=80,
            niter=188, checkpointEvery=50, name="lw_lg80"),
        spe=12, splits=("train", "test"))

print("ALL-DONE", len(RESULTS), flush=True)
