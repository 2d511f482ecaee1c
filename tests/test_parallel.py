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


def test_make_mesh_rejects_bad_shapes():
    """Edge cases from MULTICHIP_r01's failure mode: 1 device + model axis 2
    must raise clearly (not assert with a misleading message or build an
    empty mesh), as must oversubscription and n_model<1."""
    import pytest

    one = jax.devices()[:1]
    with pytest.raises(ValueError, match="does not fit"):
        parallel.make_mesh(n_model=2, devices=one)
    with pytest.raises(ValueError, match="needs"):
        parallel.make_mesh(n_data=4, n_model=2, devices=one)
    with pytest.raises(ValueError, match="n_model"):
        parallel.make_mesh(n_model=0)
    # explicit n_data=0 falls back to all-devices-over-model
    mesh = parallel.make_mesh(n_data=0, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_tp_rules_fail_loudly_on_rename(rng):
    """A param tree whose names don't match the TP rules must raise instead
    of silently training replicated on a model>1 mesh — including a PARTIAL
    rename, where some rules still match (VERDICT r1 weak #5)."""
    import pytest

    mesh = parallel.make_mesh(n_data=4, n_model=2)
    fake_state = {"params_g": {"encoder_renamed": {"conv_five": {"w":
                  jnp.zeros((4, 4, 8, 64))}}}}
    with pytest.raises(ValueError, match="matched no parameter"):
        parallel.state_shardings(mesh, fake_state)

    partial = {"params_g": {
        "enc": {"conv_five": {"w": jnp.zeros((4, 4, 8, 64))}},
        "bott_bn": {"gamma": jnp.zeros(64)},
        "dec": {"up0": {"w": jnp.zeros((4, 4, 64, 64))}}}}
    with pytest.raises(ValueError, match=r"enc/conv5/w"):
        parallel.state_shardings(mesh, partial)


def test_tp_shards_video3d_5d_weights(rng):
    """The TP rules derive axis positions from leaf.ndim: video3d's 5-D
    bottleneck weights (t,kh,kw,cin,nB)/(t,kh,kw,nB,cout) must shard the
    nBottleneck dimension, not a spatial/cin axis (full-repo review r2)."""
    opt = Opt(nef=8, ngf=8, ndf=8, nBottleneck=64, predLen=2, batchSize=8,
              video3dLevels=5, computeDtype="float32")
    state = init_train_state(rng, opt, "video3d")
    mesh = parallel.make_mesh(n_data=2, n_model=4)
    sharded = parallel.shard_train_state(mesh, state)
    w = sharded.params_g["enc"]["conv5"]["w"]     # (t,4,4,cin,nB)
    assert w.ndim == 5
    shard = w.sharding.shard_shape(w.shape)
    assert shard[-1] == w.shape[-1] // 4          # nB sharded
    assert shard[:-1] == w.shape[:-1]             # nothing else
    up0 = sharded.params_g["dec"]["up0"]["w"]     # (t,4,4,nB,cout)
    shard0 = up0.sharding.shard_shape(up0.shape)
    assert shard0[-2] == up0.shape[-2] // 4
    assert shard0[:3] == up0.shape[:3] and shard0[-1] == up0.shape[-1]


def test_tp_video3d_step_matches_replicated(rng):
    """TP over the 5-D bottleneck weights must reproduce the replicated
    video3d step (numerical equivalence, not just sharding layout)."""
    # levels=5 (input 128^2): the TP rules key on the bottleneck conv's name
    # (`conv5` = conv{levels}); other level counts fail the rename guard.
    opt = Opt(nef=8, ngf=8, ndf=8, nBottleneck=64, predLen=2, batchSize=8,
              fineSize=128, video3dLevels=5, wtl2=0.999, weight_nomask=0.05,
              computeDtype="float32")
    state = init_train_state(rng, opt, "video3d")
    step = jax.jit(make_train_step(opt, "video3d"))
    rs = np.random.RandomState(0)
    batch = {"real": jnp.asarray(
                 rs.rand(8, 2, 128, 128, 3).astype(np.float32) * 2 - 1),
             "mask": jnp.zeros((8, 1, 128, 128, 1))
                        .at[:, :, 40:80, 40:80].set(1.0)}
    key = jax.random.PRNGKey(3)
    s_ref, m_ref = step(state, batch, key)

    mesh = parallel.make_mesh(n_data=2, n_model=4)
    s_tp, m_tp = step(parallel.shard_train_state(mesh, state),
                      parallel.shard_batch(mesh, batch), key)
    np.testing.assert_allclose(float(m_ref["errG_total"]),
                               float(m_tp["errG_total"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s_ref.params_g),
                    jax.tree.leaves(s_tp.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=4.1e-3)
