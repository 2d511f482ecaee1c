"""Held-out learning-dynamics ledgers (VERDICT r2 next-round item 1).

Re-runs the three round-2 on-chip dynamics runs (center/video/video3d,
BASELINE.md:63-65) with split=80 so each corpus reserves a held-out tail
(center: the last 20% of the folder images; video: the last ~13 frames of
each 64-frame video), then evaluates init/~800/3000-step checkpoints on
BOTH splits.  Same protocol as round 2 otherwise: synthetic corpora,
seed 222 (eval n_batches=16 with *_std dispersion since round 4; rounds
2-3 used 4).  NOTE split=80 shrinks the train set to 205
images / 204 frames -> 3 steps/epoch at batch 64 (6 at batch 32), hence
the adjusted niter/checkpointEvery to land on the same step counts.
"""
import sys, os

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)  # ledger_common (the script chdirs to /tmp)

WORK = "/tmp/heldout3"
os.makedirs(WORK, exist_ok=True)
os.chdir(WORK)

from video_filler_tpu.data import synthetic  # noqa: E402

# Same corpora as the round-2 train-set ledgers (BASELINE.md:63-65):
# 256 textures for center, 4x 64-frame videos + logo mask for video/video3d.
if not os.path.isdir("images"):
    synthetic.make_image_folder("images", n=256, h=160, w=200, seed=0)
if not os.path.isdir("corpus"):
    synthetic.make_video_corpus("corpus", n_videos=4, frames=64,
                                h=180, w=240)
    synthetic.make_mask_png("mask.png", h=180, w=240)
print("corpora ready", flush=True)

from ledger_common import json_flusher, run_ledger  # noqa: E402
from video_filler_tpu.config import Opt  # noqa: E402

RESULTS = []
# Flush after EVERY row: a tunnel flap mid-way keeps the regimes/rows
# already scored (the checkpoints also persist for rescore_ledgers.py).
_flush = json_flusher("heldout_results.json", RESULTS)


def run(regime, opt, spe):
    run_ledger(opt, regime, ("train", "test"), RESULTS,
               mid_tag=f"step{opt.checkpointEvery * spe}",
               final_tag=f"step{opt.niter * spe}", flush=_flush)


common = dict(loadSize=150, fineSize=128, nBottleneck=4000, wtl2=0.999,
              ntrain=256, nThreads=2, manualSeed=222, display=False,
              logEvery=400, split=80)

run("center",
    Opt(DATA_ROOT="images", batchSize=64, overlapPred=4, niter=1000,
        checkpointEvery=267, name="hc", **common), spe=3)

run("video",
    Opt(DATA_ROOT="corpus", maskName="mask.png", batchSize=64, predLen=2,
        weight_nomask=0.05, niter=1000, checkpointEvery=267, name="hv",
        **common), spe=3)

run("video3d",
    Opt(DATA_ROOT="corpus", maskName="mask.png", batchSize=32, predLen=4,
        weight_nomask=0.05, niter=500, checkpointEvery=133, name="h3",
        **common), spe=6)

print("ALL-DONE", len(RESULTS), flush=True)
