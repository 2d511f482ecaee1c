"""keepBest=1 on-chip demo (round 5): bank the held-out peak automatically.

The three-corpus center soaks show the held-out peak's LOCATION is not
predictable from corpus size (step ~1.2k on 2048 textures, ~8.7k on 512 —
BASELINE.md), which is why the trainer grew `keepBest=1`.  This run
exercises the feature end-to-end on the real chip under the soak
protocol's conditions: center on the 512-texture corpus (the
dip-then-recover curve, i.e. the case a fixed early stop gets WRONG),
reduced width so each banked G+BN fetch stays small over the axon tunnel
(~5M params; full width would be ~280 MB/save — CLAUDE.md's bulk-transfer
gotcha), in-train eval every 100 epochs on the held-out split.

Checks (all printed, rows JSON-flushed):
  1. the banked {name}_best_state.npz meta equals the MINIMUM held-out
     hole-L2 over all in-train eval events (the loop's JSONL);
  2. re-scoring the banked file through the ordinary `net=` eval path
     reproduces the banked metric (same seeded eval stream);
  3. the banked peak beats the final state whenever the curve's minimum
     is not its last point — keepBest's whole value proposition.

Usage: python scripts/run_keepbest_demo.py
"""
import json
import os
import sys

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

WORK = "/tmp/midcorpus"   # shares run_center_soak512.py's corpus
os.makedirs(WORK, exist_ok=True)
os.chdir(WORK)

from video_filler_tpu.data import synthetic  # noqa: E402

if not os.path.isdir("images"):
    synthetic.make_image_folder("images", n=512, h=160, w=200, seed=0)
    print("corpus built: 512 textures", flush=True)

import numpy as np  # noqa: E402

from ledger_common import json_flusher  # noqa: E402
from video_filler_tpu.config import Opt  # noqa: E402
from video_filler_tpu.eval.metrics import evaluate  # noqa: E402
from video_filler_tpu.train.loop import train  # noqa: E402

NAME = "kb_demo"
BEST = f"checkpoints/{NAME}_best_state.npz"
LOG = f"logs/{NAME}.jsonl"
for stale in (BEST, LOG):   # a queue retry must not parse a prior attempt
    if os.path.exists(stale):
        os.remove(stale)

opt = Opt(DATA_ROOT="images", batchSize=64, overlapPred=4, loadSize=150,
          fineSize=128, nef=32, ngf=32, ndf=32, nBottleneck=512,
          wtl2=0.999, ntrain=384, nThreads=2, manualSeed=222,
          display=False, logEvery=1200, split=80, niter=1667,
          checkpointEvery=9999, name=NAME, dataDevice=True,
          evalEvery=100, evalBatches=16, evalSplit="test",
          keepBest=True, bestMetric="hole_l2")

rows = []
_flush = json_flusher("keepbest_demo_results.json", rows)

state = train(opt, "center", quiet=False)

# 1. curve vs banked meta ---------------------------------------------------
evals = [json.loads(ln) for ln in open(LOG) if "eval_epoch" in ln]
assert evals, "no in-train eval events recorded"
for e in evals:
    row = {"regime": "center", "ckpt": f"step{e['eval_epoch'] * 6}",
           "evalSplit": e["split"],
           **{k: e[k] for k in ("l2", "psnr_db", "ssim", "hole_l2",
                                "l2_std", "psnr_db_std", "ssim_std",
                                "hole_l2_std") if k in e}}
    rows.append(row)
    print("ROW", json.dumps(row), flush=True)
_flush()

with np.load(BEST, allow_pickle=False) as data:
    meta = json.loads(str(data["__meta__"]))
curve_min = min(e["hole_l2"] for e in evals)
# (JSONL rounds to 5 decimals; meta keeps full precision.)
assert abs(meta["hole_l2"] - curve_min) < 1e-4, (meta, curve_min)
print(f"CHECK1 ok: banked hole_l2={meta['hole_l2']:.5f} == curve min "
      f"{curve_min:.5f} (epoch {meta['epoch']}, step {meta['step']})",
      flush=True)

# 2. the ordinary net= eval path reproduces the banked value ---------------
m = evaluate(opt.replace(net=BEST), "center", n_batches=16)
row = {"regime": "center", "ckpt": "best-rescored", "evalSplit": "test",
       **{k: round(float(v), 4) for k, v in m.items()}}
rows.append(row)
print("ROW", json.dumps(row), flush=True)
_flush()
assert abs(float(m["hole_l2"]) - meta["hole_l2"]) < 5e-4, (
    float(m["hole_l2"]), meta["hole_l2"])
print(f"CHECK2 ok: net={BEST} rescores to hole_l2="
      f"{float(m['hole_l2']):.5f} (banked {meta['hole_l2']:.5f})",
      flush=True)

# 3. peak vs final ----------------------------------------------------------
final = evals[-1]["hole_l2"]
verdict = ("banked peak BEATS final state" if meta["hole_l2"] < final
           else "final state is the peak (monotone run)")
row = {"regime": "center", "ckpt": "final-vs-best", "evalSplit": "test",
       "hole_l2_final": final, "hole_l2_best": meta["hole_l2"],
       "best_step": meta["step"], "verdict": verdict}
rows.append(row)
print("ROW", json.dumps(row), flush=True)
_flush()
print(f"CHECK3: {verdict} (final {final:.5f} vs best {meta['hole_l2']:.5f} "
      f"@step {meta['step']})", flush=True)

print("ALL-DONE", len(rows), flush=True)
