"""Re-evaluate the round-3 held-out CENTER ledger checkpoints under the
current evaluate() metric domain.

Late round 3 changed eval/metrics.evaluate for regime=center: full-frame
L2/PSNR/SSIM are now computed on the demo.lua:73-76 paste-back composite
(prediction inside the hole, ground truth outside — the same domain as the
masked regimes) instead of on the raw 64x64 crop, where l2 == hole_l2 by
construction.  The hc_* checkpoints from scripts/run_heldout_ledgers.py
are re-scored here so BASELINE.md's center rows are reproducible with
current code; hole-L2 is domain-independent and must match the old rows.

Usage (real TPU or CPU):
    timeout 580 python scripts/reeval_center_ledger.py [WORKDIR]
WORKDIR defaults to /tmp/heldout3 (where run_heldout_ledgers.py trained).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = sys.argv[1] if len(sys.argv) > 1 else "/tmp/heldout3"
os.chdir(WORK)

from video_filler_tpu.config import Opt  # noqa: E402
from video_filler_tpu.eval.metrics import evaluate  # noqa: E402

opt = Opt(DATA_ROOT="images", batchSize=64, overlapPred=4, loadSize=150,
          fineSize=128, nBottleneck=4000, wtl2=0.999, manualSeed=222,
          split=80, display=False)

rows = []
for tag, ck in [("init", "hc_init_0_state.npz"),
                ("step801", "hc_267_state.npz"),
                ("step3000", "hc_final_999_state.npz")]:
    path = os.path.join("checkpoints", ck)
    if not os.path.exists(path):
        print(f"MISSING {path}", flush=True)
        continue
    for es in ("train", "test"):
        m = evaluate(opt.replace(net=path, evalSplit=es), "center",
                     n_batches=4)
        row = {"regime": "center", "ckpt": tag, "evalSplit": es,
               **{k: round(float(v), 4) for k, v in m.items()}}
        rows.append(row)
        print("ROW", json.dumps(row), flush=True)

with open("center_reeval.json", "w") as f:
    json.dump(rows, f, indent=1)
print("ALL-DONE", len(rows), flush=True)
