"""Shared eval plumbing: checkpoint → jitted eval-mode generator."""

from __future__ import annotations

import jax

from video_filler_tpu.checkpoint import restore_checkpoint
from video_filler_tpu.config import Opt
from video_filler_tpu.models import build_for_regime
from video_filler_tpu.train.step import init_train_state


def load_generator(opt: Opt, regime: str, net_path: str):
    """Load a training checkpoint and return (forward, params_g, state_g)
    with forward jitted in eval mode (net:evaluate() in every reference test
    script — BN uses running statistics)."""
    target = init_train_state(jax.random.PRNGKey(0), opt, regime)
    state, _meta = restore_checkpoint(net_path, target)
    gen = build_for_regime(opt, regime)[0]

    @jax.jit
    def forward(params, bn_state, x):
        y, _ = gen.apply(params, bn_state, x, train=False)
        return y

    return forward, state.params_g, state.state_g
