"""Re-score every surviving learning-dynamics ledger checkpoint under the
round-4 eval protocol (n_batches=16, ~1024 samples, with across-batch
*_std dispersion columns — VERDICT r3 item 6).

Rounds 2-3 scored each checkpoint on n_batches=4 (~256 samples), too thin
for the 0.1-0.4 dB train-vs-held-out deltas BASELINE.md quotes.  This
script re-evaluates the EXISTING checkpoints from the round-3 runs (no
retraining) so the held-out table gains error bars.

The logo ledger (lw_lg) is train-split-only here: its checkpoints were
trained before PairedIndex grew split support, on a split-less pair list —
held-out logo metrics need the round-4 retrain (run_logo_wholeim_ledgers
with split=80).

Usage (real TPU or JAX_PLATFORMS=cpu):
    timeout 3600 python scripts/rescore_ledgers.py [hc hv h3 bc ca lw_wi lw_lg]
Writes rescore_r4.json next to this repo's BASELINE.md inputs.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")  # env alone hangs (CLAUDE.md)

from video_filler_tpu.config import Opt  # noqa: E402
from video_filler_tpu.eval.metrics import evaluate  # noqa: E402

_CENTER = dict(batchSize=64, overlapPred=4, loadSize=150, fineSize=128,
               nBottleneck=4000, wtl2=0.999, manualSeed=222, display=False,
               split=80)
_VID = dict(loadSize=150, fineSize=128, nBottleneck=4000, wtl2=0.999,
            weight_nomask=0.05, manualSeed=222, display=False, split=80)

# key -> (workdir, regime, opt, [(tag, ckpt)], splits)
LEDGERS = {
    "hc": ("/tmp/heldout3", "center", Opt(DATA_ROOT="images", **_CENTER),
           [("init", "hc_init_0"), ("step801", "hc_267"),
            ("step3000", "hc_final_999")], ("train", "test")),
    "hv": ("/tmp/heldout3", "video",
           Opt(DATA_ROOT="corpus", maskName="mask.png", batchSize=64,
               predLen=2, **_VID),
           [("init", "hv_init_0"), ("step801", "hv_267"),
            ("step3000", "hv_final_999")], ("train", "test")),
    "h3": ("/tmp/heldout3", "video3d",
           Opt(DATA_ROOT="corpus", maskName="mask.png", batchSize=32,
               predLen=4, **_VID),
           [("init", "h3_init_0"), ("step798", "h3_133"),
            ("step3000", "h3_final_999")], ("train", "test")),
    "bc": ("/tmp/bigcorpus", "center",
           Opt(DATA_ROOT="images", ntrain=1664, **_CENTER),
           [("init", "bc_init_0"), ("step800", "bc_32"),
            ("step3000", "bc_final_999")], ("train", "test")),
    "ca": ("/tmp/bigcorpus", "center",
           Opt(DATA_ROOT="images", ntrain=1664, conditionAdv=True, **_CENTER),
           [("init", "ca_init_0"), ("step800", "ca_32"),
            ("step3000", "ca_final_999")], ("train", "test")),
    # round 5: score the noisegen16 run's surviving checkpoints — the
    # 120-epoch train completed on-chip but the ledger crashed in
    # evaluate() (noiseGen (ctx,z) input, fixed in eval/common.gen_input),
    # so scoring is all that's missing; no retrain needed (seed 222).
    "ng": ("/tmp/bigcorpus", "center",
           Opt(DATA_ROOT="images", ntrain=1664, noiseGen=True, **_CENTER),
           [("init", "ng_init_0"), ("step800", "ng_32"),
            ("step3000", "ng_final_999")], ("train", "test")),
    "lw_wi": ("/tmp/lw_ledgers", "wholeim",
              Opt(DATA_ROOT="corpus", maskName="mask.png", loadSize=180,
                  batchSize=32, nef=192, ngf=192, ndf=128, nBottleneck=6400,
                  wtl2=0.999, weight_nomask=0.05, manualSeed=222,
                  display=False, split=80),
              [("init", "lw_wi_init_0"), ("step798", "lw_wi_133"),
               ("step3000", "lw_wi_final_999")], ("train", "test")),
    "lw_lg": ("/tmp/lw_ledgers", "logo",
              Opt(DATA_ROOT="pairs/masked", DATA_ROOT_GT="pairs/gt_pairs",
                  batchSize=64, loadSize=150, fineSize=128, nBottleneck=4000,
                  wtl2=0.999, manualSeed=222, display=False),
              [("init", "lw_lg_init_0"), ("step800", "lw_lg_50"),
               ("step3000", "lw_lg_final_999")], ("train",)),
}

OUT = "/tmp/rescore_r4.json"
wanted = sys.argv[1:] or list(LEDGERS)
rows = []
if os.path.exists(OUT):  # merge: keep rows for ledgers not being re-scored
    rows = [r for r in json.load(open(OUT)) if r["ledger"] not in wanted]
    print(f"kept {len(rows)} prior rows", flush=True)
for key in wanted:
    work, regime, opt, ckpts, splits = LEDGERS[key]
    if not os.path.isdir(work):
        print(f"SKIP {key}: no workdir {work}", flush=True)
        continue
    os.chdir(work)
    for tag, ck in ckpts:
        path = os.path.join("checkpoints", f"{ck}_state.npz")
        if not os.path.exists(path):
            print(f"MISSING {path}", flush=True)
            continue
        for es in splits:
            m = evaluate(opt.replace(net=path, evalSplit=es), regime,
                         n_batches=16)
            row = {"regime": regime, "ledger": key, "ckpt": tag,
                   "evalSplit": es,
                   **{k: round(float(v), 4) for k, v in m.items()}}
            rows.append(row)
            print("ROW", json.dumps(row), flush=True)
            # Write after every row: a multi-hour CPU re-score may be
            # preempted by higher-priority TPU work when the tunnel
            # returns; incremental writes make the kill lossless (the
            # merge logic above resumes per-ledger).
            with open(OUT, "w") as f:
                json.dump(rows, f, indent=1)
print("ALL-DONE", len(rows), flush=True)
