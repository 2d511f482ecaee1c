"""Shared learning-dynamics ledger protocol (round 3).

One implementation of the init/~800/3000-step checkpoint-and-evaluate
loop used by run_condadv_ledger.py and run_logo_wholeim_ledgers.py
(protocol: seed via opt.manualSeed, eval n_batches=16 since round 4 —
~1024 samples/checkpoint, with *_std dispersion columns from
eval.metrics.evaluate; rounds 2-3 used 4 — ROW lines on stdout) so a
protocol change happens in exactly one place.
"""
import json
import os

import jax

from video_filler_tpu.checkpoint import save_checkpoint
from video_filler_tpu.eval.common import live_generator
from video_filler_tpu.eval.metrics import evaluate
from video_filler_tpu.train.loop import train
from video_filler_tpu.train.step import init_train_state


def _score(opt, regime, tag, splits, results, n_batches,
           net="(live)", loaded=None):
    for es in splits:
        m = evaluate(opt.replace(net=net, evalSplit=es), regime,
                     n_batches=n_batches, loaded=loaded)
        row = {"regime": regime, "ckpt": tag, "evalSplit": es,
               **{k: round(float(v), 4) for k, v in m.items()}}
        results.append(row)
        print("ROW", json.dumps(row), flush=True)


def run_ledger(opt, regime, splits, results, mid_tag, final_tag,
               max_steps=3000, n_batches=16, save=True):
    """Train ``opt`` to ``max_steps`` and evaluate the init / mid
    (checkpointEvery'th epoch) / final checkpoints on each split,
    appending row dicts to ``results`` and printing ROW lines.

    ``save=False`` scores the init and final states DEVICE-RESIDENT
    (eval/common.live_generator) and writes no checkpoint at all — for
    models whose full TrainState is too large to device_get over the axon
    tunnel (the 4.5 GB wholeim fetch that hung the relay, CLAUDE.md).  No
    mid row in that mode; pair it with checkpointEvery > niter so the
    train loop saves nothing either."""
    state0 = init_train_state(jax.random.PRNGKey(opt.manualSeed), opt,
                              regime)
    if not save:
        _score(opt, regime, "init", splits, results, n_batches,
               loaded=live_generator(opt, regime, state0))
        del state0
        state = train(opt, regime, max_steps=max_steps)
        _score(opt, regime, final_tag, splits, results, n_batches,
               loaded=live_generator(opt, regime, state))
        del state
        return
    p0 = save_checkpoint("checkpoints", f"{opt.name}_init", 0,
                         jax.device_get(state0))
    del state0
    state = train(opt, regime, max_steps=max_steps)
    final = f"checkpoints/{opt.name}_{opt.niter}_state.npz"
    if not os.path.exists(final):
        final = save_checkpoint("checkpoints", f"{opt.name}_final", 999,
                                jax.device_get(state))
    del state
    mid = f"checkpoints/{opt.name}_{opt.checkpointEvery}_state.npz"
    for tag, path in [("init", p0), (mid_tag, mid), (final_tag, final)]:
        if not os.path.exists(path):
            print(f"MISSING {path}", flush=True)
            continue
        _score(opt, regime, tag, splits, results, n_batches, net=path)
