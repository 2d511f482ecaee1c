"""Re-evaluate the round-3 CENTER-family ledger checkpoints under the
current evaluate() metric domain.

Late round 3 changed eval/metrics.evaluate for regime=center: full-frame
L2/PSNR/SSIM are now computed on the demo.lua:73-76 paste-back composite
(prediction inside the hole, ground truth outside — the same domain as the
masked regimes) instead of on the raw 64x64 crop, where l2 == hole_l2 by
construction.  The checkpoints from the three center-family ledger runs
(held-out hc_*, corpus-size-control bc_*, conditionAdv ca_*) are re-scored
here so BASELINE.md's center rows are reproducible with current code;
hole-L2 is domain-independent and must match the old rows exactly.

Usage (real TPU or CPU):
    timeout 1200 python scripts/reeval_center_ledger.py [hc|bc|ca ...]
With no argument all three ledgers whose workdirs survive are re-scored.
Writes center_reeval.json into each ledger's workdir.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    # The env var alone does NOT keep the axon plugin from engaging when
    # the tunnel is down (fresh process, no prior jax import — still hangs
    # at backend init); the explicit config update always works (CLAUDE.md).
    import jax

    jax.config.update("jax_platforms", "cpu")

from video_filler_tpu.config import Opt  # noqa: E402
from video_filler_tpu.eval.metrics import evaluate  # noqa: E402

_COMMON = dict(batchSize=64, overlapPred=4, loadSize=150, fineSize=128,
               nBottleneck=4000, wtl2=0.999, manualSeed=222, display=False,
               split=80)

# ledger key -> (workdir, opt, [(tag, checkpoint file)])
LEDGERS = {
    # scripts/run_heldout_ledgers.py: 256 textures, 3 steps/epoch
    "hc": ("/tmp/heldout3", Opt(DATA_ROOT="images", **_COMMON),
           [("init", "hc_init_0_state.npz"),
            ("step801", "hc_267_state.npz"),
            ("step3000", "hc_final_999_state.npz")]),
    # scripts/run_center_bigcorpus.py: 2048 textures, 25 steps/epoch
    "bc": ("/tmp/bigcorpus", Opt(DATA_ROOT="images", ntrain=1664, **_COMMON),
           [("init", "bc_init_0_state.npz"),
            ("step800", "bc_32_state.npz"),
            ("step3000", "bc_final_999_state.npz")]),
    # scripts/run_condadv_ledger.py: same corpus, conditioned D head
    "ca": ("/tmp/bigcorpus", Opt(DATA_ROOT="images", ntrain=1664,
                                 conditionAdv=True, **_COMMON),
           [("init", "ca_init_0_state.npz"),
            ("step800", "ca_32_state.npz"),
            ("step3000", "ca_final_999_state.npz")]),
}

wanted = sys.argv[1:] or list(LEDGERS)
for key in wanted:
    work, opt, ckpts = LEDGERS[key]
    if not os.path.isdir(work):
        print(f"SKIP {key}: no workdir {work}", flush=True)
        continue
    os.chdir(work)
    rows = []
    for tag, ck in ckpts:
        path = os.path.join("checkpoints", ck)
        if not os.path.exists(path):
            print(f"MISSING {path}", flush=True)
            continue
        for es in ("train", "test"):
            m = evaluate(opt.replace(net=path, evalSplit=es), "center",
                         n_batches=16)
            row = {"regime": "center", "ledger": key, "ckpt": tag,
                   "evalSplit": es,
                   **{k: round(float(v), 4) for k, v in m.items()}}
            rows.append(row)
            print("ROW", json.dumps(row), flush=True)
    out = f"center_reeval_{key}.json" if key != "hc" else "center_reeval.json"
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"DONE {key} -> {os.path.join(work, out)} ({len(rows)} rows)",
          flush=True)
print("ALL-DONE", flush=True)
