"""Multi-device tests on the 8-virtual-CPU mesh: DP equivalence, TP sharding,
global BatchNorm statistics — the multi-chip story without multi-chip hardware."""

import jax
import jax.numpy as jnp
import numpy as np

from video_filler_tpu import parallel
from video_filler_tpu.config import Opt
from video_filler_tpu.train import init_train_state, make_train_step

TINY = dict(nef=8, ngf=8, ndf=8, nBottleneck=64, batchSize=8,
            computeDtype="float32")


def _batch(b=8):
    rs = np.random.RandomState(0)
    return {"real": jnp.asarray(rs.rand(b, 128, 128, 3).astype(np.float32)
                                * 2 - 1)}


def test_mesh_shapes():
    mesh = parallel.make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = parallel.make_mesh(n_data=4, n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_dp_step_matches_single_device(rng):
    """Sharding the batch over 8 devices must not change the math: global BN
    stats + gradient all-reduce == one big device."""
    opt = Opt(wtl2=0.999, **TINY)
    state = init_train_state(rng, opt, "center")
    step = jax.jit(make_train_step(opt, "center"))
    batch = _batch()
    key = jax.random.PRNGKey(1)

    s_single, m_single = step(state, batch, key)

    mesh = parallel.make_mesh(n_data=8)
    state_sh = parallel.shard_train_state(mesh, state)
    batch_sh = parallel.shard_batch(mesh, batch)
    s_dp, m_dp = step(state_sh, batch_sh, key)

    np.testing.assert_allclose(float(m_single["errD"]), float(m_dp["errD"]),
                               rtol=1e-4)
    # Post-Adam params: first-step Adam ~= lr*sign(g), so reduction-order
    # noise at g~0 flips signs worth 2*lr_G = 4e-3 — compare with that bound
    # (a real sharding bug shows O(1) errors).
    for a, b in zip(jax.tree.leaves(s_single.params_g),
                    jax.tree.leaves(s_dp.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=4.1e-3)


def test_tp_step_matches_replicated(rng):
    """TP-sharding the bottleneck (model axis) must match the replicated run."""
    opt = Opt(wtl2=0.999, **TINY)
    state = init_train_state(rng, opt, "center")
    step = jax.jit(make_train_step(opt, "center"))
    batch = _batch()
    key = jax.random.PRNGKey(2)

    s_ref, m_ref = step(state, batch, key)

    mesh = parallel.make_mesh(n_data=2, n_model=4)
    s_tp, m_tp = step(parallel.shard_train_state(mesh, state),
                      parallel.shard_batch(mesh, batch), key)
    np.testing.assert_allclose(float(m_ref["errG_total"]),
                               float(m_tp["errG_total"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s_ref.params_g),
                    jax.tree.leaves(s_tp.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=4.1e-3)


def test_tp_params_actually_sharded(rng):
    opt = Opt(**TINY)
    state = init_train_state(rng, opt, "center")
    mesh = parallel.make_mesh(n_data=2, n_model=4)
    sharded = parallel.shard_train_state(mesh, state)
    w = sharded.params_g["enc"]["conv5"]["w"]  # (4,4,64,nB) sharded on nB
    shard_shape = w.sharding.shard_shape(w.shape)
    assert shard_shape[-1] == w.shape[-1] // 4
    up0 = sharded.params_g["dec"]["up0"]["w"]  # (4,4,nB,8ngf) sharded on nB
    assert up0.sharding.shard_shape(up0.shape)[2] == up0.shape[2] // 4
