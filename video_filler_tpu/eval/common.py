"""Shared eval plumbing: checkpoint → jitted eval-mode generator."""

from __future__ import annotations

import jax

from video_filler_tpu.checkpoint import restore_subtree
from video_filler_tpu.config import Opt
from video_filler_tpu.models import build_for_regime


def gen_input(opt: Opt, ctx, key):
    """Generator input for an eval forward.

    noiseGen generators join an nz-channel noise projection into the
    bottleneck and take x=(ctx, z) with z shaped (B,1,1,nz)
    (train.lua:107-150); every other variant takes ctx alone.  The z draw
    matches training's per-step regeneration (train.lua:319-323,
    train/step.py _draw_noise): opt.noisetype selects uniform [-1,1] or
    standard normal."""
    if not opt.noiseGen:
        return ctx
    shape = (ctx.shape[0], 1, 1, opt.nz)
    z = (jax.random.uniform(key, shape, minval=-1.0, maxval=1.0)
         if opt.noisetype == "uniform"
         else jax.random.normal(key, shape))
    return (ctx, z)


def load_generator(opt: Opt, regime: str, net_path: str):
    """Load JUST the generator from a training checkpoint and return
    (forward, params_g, state_g) with forward jitted in eval mode
    (net:evaluate() in every reference test script — BN uses running
    statistics).  Only the G leaves need to match: D/optimizer shapes in the
    file are ignored (util.load-a-single-net semantics).

    ``net=....t7`` loads a reference Torch7 netG checkpoint directly
    (checkpoint/t7.py importer) — a reference user's published/trained nets
    work in every eval CLI unconverted."""
    gen = build_for_regime(opt, regime)[0]
    if net_path.endswith(".t7"):
        import jax.numpy as jnp

        from video_filler_tpu.checkpoint.t7 import import_generator
        from video_filler_tpu.models import specs_for_regime
        gspec, _ = specs_for_regime(opt, regime)
        p_np, s_np = import_generator(net_path, gspec)
        params = jax.tree.map(jnp.asarray, p_np)
        bn_state = jax.tree.map(jnp.asarray, s_np)
    else:
        params_t, state_t = gen.init(jax.random.PRNGKey(0))
        params = restore_subtree(net_path, params_t, ".params_g")
        bn_state = restore_subtree(net_path, state_t, ".state_g")
    # Inference-only weight residency: conv kernels/biases live on device in
    # the COMPUTE dtype.  The conv apply casts w/b to computeDtype in-jit
    # anyway (ops/layers.py), so pre-casting is bit-identical — but f32
    # residency makes every forward stream the f32 weights from HBM just to
    # feed the cast (~284 MB/batch for the flagship G); bf16 residency
    # halves that.  BN leaves stay f32: its math runs in f32 by design.
    import jax.numpy as jnp
    cdtype = jnp.dtype(opt.computeDtype)

    def _resident(path, leaf):
        name = getattr(path[-1], "key", None)
        return jnp.asarray(leaf, cdtype) if name in ("w", "b") else leaf

    params = jax.tree_util.tree_map_with_path(_resident, params)
    # Commit the weights to device ONCE: restore/import return host-numpy
    # trees, and jit re-transfers numpy arguments on EVERY call — serving
    # and throughput benches would otherwise re-upload the full generator
    # per forward (eval/stream.py device_puts for the same reason).
    params = jax.device_put(params)
    bn_state = jax.device_put(bn_state)

    @jax.jit
    def forward(params, bn_state, x):
        y, _ = gen.apply(params, bn_state, x, train=False)
        return y

    return forward, params, bn_state


def live_generator(opt: Opt, regime: str, train_state):
    """(forward, params_g, state_g) straight from a DEVICE-RESIDENT
    TrainState — no checkpoint file, no host fetch.

    evaluate()/bench_inference consume only the generator subtree, so
    scoring a freshly-trained state never needs the full-TrainState
    device_get that save_checkpoint implies.  Over the axon tunnel that
    fetch is the single most dangerous operation in the repo (a 4.5 GB
    wholeim TrainState fetch hung the client AND the relay — CLAUDE.md);
    on co-located TPU VMs it is merely wasted minutes.  Numerics are
    identical to saving then load_generator(): the conv apply casts
    weights to computeDtype in-jit either way, and BN eval mode reads the
    same running statistics (net:evaluate(), test.lua:111)."""
    gen = build_for_regime(opt, regime)[0]

    @jax.jit
    def forward(params, bn_state, x):
        y, _ = gen.apply(params, bn_state, x, train=False)
        return y

    return forward, train_state.params_g, train_state.state_g
