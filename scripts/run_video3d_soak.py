"""video3d 10k-step soak (round 5) — the long-horizon curve for the 3D model.

Every other regime family now has a long-horizon soak: center 10k on the
2048-texture corpus (held-out peaks @1250 then drifts), video 10k
(overtrains past ~3k — D collapses the adversarial game, BASELINE.md),
wholeim 10k/30k (still under-trained at 10k).  video3d — the temporal-conv
family (train_deepernet.lua) — only has evidence to 3,000 steps
(hole-L2 0.030 held-out, heldout_results.json).  This soak answers which
failure mode the 3D model inherits at 10k on the same 4-video corpus:
video's GAN overtraining, or wholeim's slow-but-monotone descent.

Protocol: identical config to the heldout ledger's video3d run
(scripts/run_heldout_ledgers.py — batch 32, predLen=4, split=80, seed
222), extended to 10,002 steps with ``dataDevice=1`` (HBM-resident
corpus, in-jit batch synthesis — the per-step host traffic that leaks
~27 MB/step in the axon transport never happens) and save-free
device-resident scoring every 167 epochs (~1,000 steps), 16-batch ±std.

Usage: python scripts/run_video3d_soak.py
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
_flush = json_flusher("video3d_soak_results.json", rows)

# Same widths/corpus/seed as the heldout ledger (6 steps/epoch at
# batch 32 on the 204-frame train split); niter=1667 -> 10,002 steps.
run_ledger(Opt(DATA_ROOT="corpus", maskName="mask.png", batchSize=32,
               predLen=4, weight_nomask=0.05, loadSize=150, fineSize=128,
               nBottleneck=4000, wtl2=0.999, ntrain=256, nThreads=2,
               manualSeed=222, display=False, logEvery=1000, split=80,
               niter=1667, checkpointEvery=9999, name="v3_soak",
               dataDevice=True),
           "video3d", ("train", "test"), rows,
           mid_tag="step3000", final_tag="step10002",
           max_steps=10002, save=False, score_every=167, flush=_flush)

print("ALL-DONE", len(rows), flush=True)
