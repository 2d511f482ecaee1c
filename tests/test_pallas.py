"""Pallas fused-loss kernel parity vs the jnp reference (interpret mode on
CPU; the same kernels compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_filler_tpu.ops import losses
from video_filler_tpu.ops.pallas import fused_weighted_mse, pallas_supported


def _data(shape=(2, 16, 16, 8), seed=0):
    rs = np.random.RandomState(seed)
    p = jnp.asarray(rs.randn(*shape).astype(np.float32))
    t = jnp.asarray(rs.randn(*shape).astype(np.float32))
    w = jnp.asarray(rs.rand(*shape).astype(np.float32))
    return p, t, w


def test_supported_shapes():
    assert pallas_supported((2, 128, 128, 12))     # video 128², nc*predLen=12
    assert pallas_supported((4, 64, 64, 2))        # 64*2=128 lanes
    assert not pallas_supported((2, 7, 9, 5))
    assert not pallas_supported((2, 128, 128))


def test_forward_matches_reference():
    p, t, w = _data()
    ours = float(fused_weighted_mse(p, t, w, True))
    ref = float(losses.weighted_mse(p, t, w))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_gradient_matches_reference():
    p, t, w = _data(seed=1)
    g_ours = jax.grad(lambda x: fused_weighted_mse(x, t, w, True))(p)
    g_ref = jax.grad(lambda x: losses.weighted_mse(x, t, w))(p)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-7)


def test_broadcast_weights():
    rs = np.random.RandomState(2)
    p = jnp.asarray(rs.randn(2, 8, 16, 8).astype(np.float32))
    t = jnp.asarray(rs.randn(2, 8, 16, 8).astype(np.float32))
    w = jnp.asarray(rs.rand(2, 8, 16, 1).astype(np.float32))  # mask-style
    ours = float(fused_weighted_mse(p, t, w, True))
    ref = float(losses.weighted_mse(p, t, w))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_under_jit_and_value_and_grad():
    p, t, w = _data(seed=3)

    @jax.jit
    def f(p):
        return jax.value_and_grad(
            lambda x: fused_weighted_mse(x, t, w, True))(p)

    v, g = f(p)
    v_ref, g_ref = jax.value_and_grad(
        lambda x: losses.weighted_mse(x, t, w))(p)
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5,
                               atol=1e-7)


def test_train_step_with_pallas_loss(rng):
    """usePallasLoss wires the kernel into the fused step (interpret on CPU)."""
    from video_filler_tpu.config import Opt
    from video_filler_tpu.train import init_train_state, make_train_step

    opt = Opt(nef=8, ngf=8, ndf=8, nBottleneck=32, batchSize=2,
              computeDtype="float32", wtl2=0.999, predLen=1,
              usePallasLoss=True)
    state = init_train_state(rng, opt, "video")
    step = jax.jit(make_train_step(opt, "video"))
    rs = np.random.RandomState(0)
    batch = {
        "real": jnp.asarray(rs.rand(2, 128, 128, 3).astype(np.float32) * 2 - 1),
        "mask": jnp.zeros((2, 128, 128, 1)).at[:, 40:80, 40:80, :].set(1.0),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))

    opt_ref = opt.replace(usePallasLoss=False)
    state2, metrics2 = jax.jit(make_train_step(opt_ref, "video"))(
        state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics["errG_total"]),
                               float(metrics2["errG_total"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_state.params_g),
                    jax.tree.leaves(state2.params_g)):
        # first-step Adam ~= lr*sign(g): tiny numeric diffs flip signs worth
        # 2*lr_G = 4e-3 (same bound as the DP/TP equivalence tests)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=4.1e-3)
