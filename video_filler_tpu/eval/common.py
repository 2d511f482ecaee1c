"""Shared eval plumbing: checkpoint → jitted eval-mode generator."""

from __future__ import annotations

import jax

from video_filler_tpu.checkpoint import restore_subtree
from video_filler_tpu.config import Opt
from video_filler_tpu.models import build_for_regime


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
