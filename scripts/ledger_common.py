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
import shutil

import jax

from video_filler_tpu.checkpoint import save_checkpoint
from video_filler_tpu.eval.common import live_generator
from video_filler_tpu.eval.metrics import evaluate
from video_filler_tpu.train.loop import train
from video_filler_tpu.train.step import init_train_state


def json_flusher(path, rows):
    """Atomic-write ``rows`` as JSON to ``path``; pass as
    run_ledger(flush=...) so every scored row is persisted the moment it
    lands — a tunnel flap killing a multi-hour ledger keeps its curve.

    A pre-existing ``path`` (a partial curve from an earlier attempt) is
    copied to ``path.prevN`` at flusher creation, so a retry that dies
    EARLIER than the first attempt can never lose the longer partial
    curve (advisor r4 #1); ``path`` itself keeps the old curve until the
    new attempt's first row lands."""
    if os.path.exists(path):
        n = 1
        while os.path.exists(f"{path}.prev{n}"):
            n += 1
        shutil.copyfile(path, f"{path}.prev{n}")

    def _flush():
        with open(path + ".tmp", "w") as f:
            json.dump(rows, f, indent=1)
        os.replace(path + ".tmp", path)
    return _flush


def _score(opt, regime, tag, splits, results, n_batches,
           net="(live)", loaded=None, flush=None):
    for es in splits:
        m = evaluate(opt.replace(net=net, evalSplit=es), regime,
                     n_batches=n_batches, loaded=loaded)
        row = {"regime": regime, "ckpt": tag, "evalSplit": es,
               **{k: round(float(v), 4) for k, v in m.items()}}
        results.append(row)
        print("ROW", json.dumps(row), flush=True)
        if flush is not None:
            flush()


def run_ledger(opt, regime, splits, results, mid_tag, final_tag,
               max_steps=3000, n_batches=16, save=True,
               score_every=None, flush=None):
    """Train ``opt`` to ``max_steps`` and evaluate the init / mid
    (checkpointEvery'th epoch) / final checkpoints on each split,
    appending row dicts to ``results`` and printing ROW lines.

    ``flush`` (optional, no-arg callable) runs after EVERY row append so a
    multi-hour run killed by a tunnel flap keeps all rows scored so far
    (the round-4 soak writes its JSON incrementally through this).

    ``save=False`` scores the init and final states DEVICE-RESIDENT
    (eval/common.live_generator) and writes no checkpoint at all — for
    models whose full TrainState is too large to device_get over the axon
    tunnel (the 4.5 GB wholeim fetch that hung the relay, CLAUDE.md).  No
    mid row in that mode; pair it with checkpointEvery > niter so the
    train loop saves nothing either.  ``score_every=N`` adds periodic
    in-loop rows every N epochs (train's epoch_hook, tagged ``stepK`` by
    global step) — the eval forward is jitted ONCE and reused, so each
    event costs only the eval batches, and a killed soak still leaves its
    curve up to the last scoring point."""
    state0 = init_train_state(jax.random.PRNGKey(opt.manualSeed), opt,
                              regime)
    if not save:
        # ONE jitted eval forward shared by the init / periodic-hook /
        # final scores: each live_generator call makes a fresh @jax.jit
        # closure, and a fresh closure is a fresh 20-120s tunnel compile
        # (ADVICE r4) — the forward depends only on (opt, regime), never
        # on the state being scored.
        fwd = live_generator(opt, regime, state0)[0]
        _score(opt, regime, "init", splits, results, n_batches,
               loaded=(fwd, state0.params_g, state0.state_g), flush=flush)
        del state0
        hook = None
        if score_every:
            def hook(epoch, state):
                if epoch % score_every:
                    return
                step_now = int(jax.device_get(state.step))
                _score(opt, regime, f"step{step_now}", splits, results,
                       n_batches, flush=flush,
                       loaded=(fwd, state.params_g, state.state_g))
        state = train(opt, regime, max_steps=max_steps, epoch_hook=hook)
        # Tag the final row by the REAL global step, not the caller's
        # hand-computed final_tag: the loop clamps ntrain to the split's
        # actual size (loop.py: ntrain = min(ds_size, opt.ntrain)), so a
        # caller that did its steps/epoch arithmetic on the unclamped
        # ntrain mislabels the row (the round-5 logo soak's "step10000"
        # was really step 7500: 819 train pairs -> 12 steps/epoch, not 16).
        real_tag = f"step{int(jax.device_get(state.step))}"
        if real_tag != final_tag:
            print(f"final_tag {final_tag} != actual {real_tag}; "
                  "using actual", flush=True)
        _score(opt, regime, real_tag, splits, results, n_batches,
               loaded=(fwd, state.params_g, state.state_g), flush=flush)
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
        _score(opt, regime, tag, splits, results, n_batches, net=path,
               flush=flush)
