"""conditionAdv learning-dynamics ledger (round 3).

The conditionAdv discriminator head — D conditioned on the (128² ctx,
64² pred) pair via parallel 5x5 convs (train.lua:158-180) — trains on the
real chip since round 2 (scripts/check_condadv_tpu.py verified a step) but
had no learning evidence: the reference forces it off in every M-variant
(train_logo_withmask.lua:43), so no published run exists either.  This run
trains center+conditionAdv on the 2048-texture corpus with a held-out
split, same protocol as scripts/run_center_bigcorpus.py, and evaluates
init/~800/3000-step checkpoints on both splits.

Usage: python scripts/run_condadv_ledger.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/tmp/bigcorpus"   # shares run_center_bigcorpus.py's corpus
os.makedirs(WORK, exist_ok=True)
os.chdir(WORK)

from video_filler_tpu.data import synthetic  # noqa: E402

if not os.path.isdir("images"):
    synthetic.make_image_folder("images", n=2048, h=160, w=200, seed=0)
    print("corpus built: 2048 textures", flush=True)

import jax  # noqa: E402

from video_filler_tpu.checkpoint import save_checkpoint  # noqa: E402
from video_filler_tpu.config import Opt  # noqa: E402
from video_filler_tpu.eval.metrics import evaluate  # noqa: E402
from video_filler_tpu.train.loop import train  # noqa: E402
from video_filler_tpu.train.step import init_train_state  # noqa: E402

opt = Opt(DATA_ROOT="images", batchSize=64, overlapPred=4, loadSize=150,
          fineSize=128, nBottleneck=4000, wtl2=0.999, ntrain=1664,
          nThreads=2, manualSeed=222, display=False, logEvery=400,
          split=80, niter=120, checkpointEvery=32, conditionAdv=True,
          name="ca")

state0 = init_train_state(jax.random.PRNGKey(opt.manualSeed), opt, "center")
p0 = save_checkpoint("checkpoints", "ca_init", 0, jax.device_get(state0))
del state0
state = train(opt, "center", max_steps=3000)
final = f"checkpoints/ca_{opt.niter}_state.npz"
if not os.path.exists(final):
    final = save_checkpoint("checkpoints", "ca_final", 999,
                            jax.device_get(state))
del state

rows = []
mid = f"checkpoints/ca_{opt.checkpointEvery}_state.npz"
for tag, path in [("init", p0), ("mid", mid), ("final", final)]:
    if not os.path.exists(path):
        print(f"MISSING {path}", flush=True)
        continue
    for es in ("train", "test"):
        m = evaluate(opt.replace(net=path, evalSplit=es), "center",
                     n_batches=4)
        row = {"ckpt": tag, "evalSplit": es,
               **{k: round(float(v), 4) for k, v in m.items()}}
        rows.append(row)
        print("ROW", json.dumps(row), flush=True)

with open("condadv_results.json", "w") as f:
    json.dump(rows, f, indent=1)
print("ALL-DONE", flush=True)
