"""Sequence-parallel temporal conv: halo-exchange correctness on the
virtual mesh, through layers, gradients, and the full video3d train step."""

import jax
import jax.numpy as jnp
import numpy as np

from video_filler_tpu.config import Opt
from video_filler_tpu.ops import layers3d
from video_filler_tpu.parallel import temporal
from video_filler_tpu.train import init_train_state, make_train_step


def test_temporal_sp_matches_unsharded(rng):
    mesh = temporal.make_seq_mesh(n_data=2, n_seq=4)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 16, 16, 4).astype(np.float32))
    w = jnp.asarray(rs.randn(3, 4, 4, 4, 8).astype(np.float32) * 0.1)

    # unsharded reference: plain conv3d (3,4,4)/(1,2,2)/(1,1,1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 2, 2), [(1, 1), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    x_sh = temporal.shard_clip(mesh, x)
    out = temporal.temporal_conv3d_sp(mesh, x_sh, w)
    assert out.shape == ref.shape == (2, 8, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # the output really is sharded over (data, seq)
    shard_shape = out.sharding.shard_shape(out.shape)
    assert shard_shape[0] == 1 and shard_shape[1] == 2


def test_temporal_sp_boundary_zero_padding(rng):
    """Edge shards must see zero halos — identical to conv zero padding."""
    mesh = temporal.make_seq_mesh(n_data=1, n_seq=4)
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 4, 8, 8, 2).astype(np.float32))
    w = jnp.asarray(rs.randn(3, 4, 4, 2, 4).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 2, 2), [(1, 1), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    out = temporal.temporal_conv3d_sp(mesh, temporal.shard_clip(mesh, x), w)
    # first/last frames depend on the zero halo: compare them specifically
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(ref[:, 0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[:, -1]), np.asarray(ref[:, -1]),
                               rtol=1e-5, atol=1e-5)


def test_sp_conv_layers_match_plain_with_grads(rng):
    """sp_conv3d / sp_conv3d_transpose == plain layers3d convs — values AND
    gradients (shard_map transposes the halo ppermute in the backward)."""
    mesh = temporal.make_seq_mesh(n_data=2, n_seq=4)
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 8, 8, 8, 4).astype(np.float32))

    for plain_l, sp_l in [
        (layers3d.conv3d(4, 6, (3, 4, 4), (1, 2, 2), (1, 1, 1),
                         dtype=jnp.float32),
         temporal.sp_conv3d(mesh, 4, 6, (3, 4, 4), (1, 2, 2), (1, 1, 1),
                            dtype=jnp.float32)),
        (layers3d.conv3d_transpose(4, 6, (3, 4, 4), (1, 2, 2), (1, 1, 1),
                                   dtype=jnp.float32),
         temporal.sp_conv3d_transpose(mesh, 4, 6, (3, 4, 4), (1, 2, 2),
                                      (1, 1, 1), dtype=jnp.float32)),
    ]:
        params, _ = plain_l.init(rng)  # same init draw for both

        def loss_plain(p, x):
            y, _ = plain_l.apply(p, {}, x)
            return jnp.sum(jnp.square(y))

        def loss_sp(p, x):
            y, _ = sp_l.apply(p, {}, x)
            return jnp.sum(jnp.square(y))

        x_sh = temporal.shard_clip(mesh, x)
        v_ref, (gw_ref, gx_ref) = jax.value_and_grad(
            loss_plain, argnums=(0, 1))(params, x)
        v_sp, (gw_sp, gx_sp) = jax.jit(jax.value_and_grad(
            loss_sp, argnums=(0, 1)))(params, x_sh)
        np.testing.assert_allclose(float(v_ref), float(v_sp), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gw_ref["w"]),
                                   np.asarray(gw_sp["w"]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gx_ref), np.asarray(gx_sp),
                                   rtol=1e-4, atol=1e-4)


def _video3d_fixture(rng):
    opt = Opt(nef=8, ngf=8, ndf=8, nBottleneck=64, predLen=4, batchSize=4,
              wtl2=0.999, weight_nomask=0.05, computeDtype="float32",
              video3dLevels=3, fineSize=32)
    state = init_train_state(rng, opt, "video3d")
    rs = np.random.RandomState(3)
    batch = {
        "real": jnp.asarray(rs.rand(4, 4, 32, 32, 3).astype(np.float32)
                            * 2 - 1),
        "mask": jnp.zeros((4, 1, 32, 32, 1)).at[:, :, 8:20, 8:20, :].set(1.0),
    }
    return opt, state, batch


def test_sp_train_step_matches_unsharded(rng):
    """The full sequence-parallel video3d GAN step (halo convs, T-gathered
    bottleneck, seq-sharded matmuls, DP+SP-global BN) == the plain step."""
    opt, state, batch = _video3d_fixture(rng)
    key = jax.random.PRNGKey(7)

    step_ref = jax.jit(make_train_step(opt, "video3d"))
    s_ref, m_ref = step_ref(state, batch, key)

    mesh = temporal.make_seq_mesh(n_data=2, n_seq=2)
    sp_step = temporal.make_sp_train_step(opt, mesh)
    s_sp, m_sp = sp_step(temporal.shard_sp_state(mesh, state),
                         temporal.shard_sp_batch(mesh, batch), key)

    for k in m_ref:
        np.testing.assert_allclose(float(m_ref[k]), float(m_sp[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    # Post-Adam params: first-step Adam ~= lr*sign(g); reduction-order noise
    # at g~0 is worth 2*lr_G = 4e-3 (same bound as the DP equivalence test).
    for a, b in zip(jax.tree.leaves(s_ref.params_g),
                    jax.tree.leaves(s_sp.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=4.1e-3)
    for a, b in zip(jax.tree.leaves(s_ref.state_g),
                    jax.tree.leaves(s_sp.state_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_sp_activations_are_time_sharded(rng):
    """The SP generator really holds T-sharded activations: its per-shard
    forward must see only T/n_seq frames at the first conv."""
    opt, state, batch = _video3d_fixture(rng)
    mesh = temporal.make_seq_mesh(n_data=2, n_seq=2)
    from video_filler_tpu.models import build_for_regime

    gen, _ = build_for_regime(opt, "video3d", sp_mesh=mesh)
    x = temporal.shard_clip(mesh, batch["real"])
    y, _ = jax.jit(lambda p, s, x: gen.apply(p, s, x, train=False))(
        state.params_g, state.state_g, x)
    assert y.shape == batch["real"].shape
    # output carries the ('data','seq') sharding from the last SP conv
    shard = y.sharding.shard_shape(y.shape)
    assert shard[0] == batch["real"].shape[0] // 2
    assert shard[1] == batch["real"].shape[1] // 2


def test_sp_host_batch_layout_matches_plain(rng):
    """The loop feeds the SP step uint8 host batches laid out by
    shard_sp_host_batch (folded channels T-major-sharded over 'seq') — the
    fused preprocess+step must produce the same metrics as plain device_put,
    and the folded-axis shards must hold whole frames."""
    from video_filler_tpu.train.step import make_preprocess

    opt = Opt(nef=8, ngf=8, ndf=8, nBottleneck=64, predLen=4, batchSize=4,
              fineSize=32, video3dLevels=3, wtl2=0.999, weight_nomask=0.05,
              computeDtype="float32")
    mesh = temporal.make_seq_mesh(n_data=2, n_seq=2)
    state = init_train_state(rng, opt, "video3d")
    preprocess = make_preprocess(opt, "video3d")
    inner = make_train_step(opt, "video3d", sp_mesh=mesh)

    def fused(state, host_batch, key):
        k1, k2 = jax.random.split(key)
        return inner(state, preprocess(host_batch, k1), k2)

    rs = np.random.RandomState(3)
    host = {
        "raw": rs.randint(0, 256, (4, 32, 32, 3 * opt.predLen), np.uint8),
        "mask": np.zeros((4, 32, 32, 1), np.uint8),
    }
    host["mask"][:, 8:20, 8:20] = 1
    key = jax.random.PRNGKey(11)
    step = jax.jit(fused)

    sp_state = temporal.shard_sp_state(mesh, state)
    dev = temporal.shard_sp_host_batch(mesh,
                                       {k: jnp.asarray(v)
                                        for k, v in host.items()})
    # each seq shard of the folded axis holds whole frames
    shard = dev["raw"].sharding.shard_shape(dev["raw"].shape)
    assert shard[-1] == 3 * opt.predLen // 2 and shard[-1] % 3 == 0
    _, m_sp = step(sp_state, dev, key)

    plain = {k: jnp.asarray(v) for k, v in host.items()}
    _, m_ref = step(temporal.shard_sp_state(mesh, state), plain, key)
    for k in m_ref:
        np.testing.assert_allclose(float(m_ref[k]), float(m_sp[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_sp_host_batch_rejects_mid_frame_split():
    """n_seq dividing the FOLDED channel count is not enough: nc=3, T=4,
    n_seq=6 divides 12 but would shard mid-frame.  The guard must check
    frame alignment (n_seq | T), loudly."""
    import pytest

    mesh = temporal.make_seq_mesh(n_data=1, n_seq=6)
    batch = {"raw": jnp.zeros((2, 8, 8, 12), jnp.uint8)}
    with pytest.raises(ValueError, match="frame count"):
        temporal.shard_sp_host_batch(mesh, batch)


def test_sp_composes_with_grad_accum(rng):
    """Sequence parallelism and gradient accumulation are both step-level
    mechanisms — the scan over microbatches must compose with the
    shard_map'd halo convs and seq-sharded bottleneck."""
    opt = Opt(nef=8, ngf=8, ndf=8, nBottleneck=64, predLen=4, batchSize=8,
              fineSize=32, video3dLevels=3, wtl2=0.999, weight_nomask=0.05,
              gradAccum=2, computeDtype="float32")
    mesh = temporal.make_seq_mesh(n_data=2, n_seq=2)
    state = init_train_state(rng, opt, "video3d")
    rs = np.random.RandomState(0)
    batch = {"real": jnp.asarray(
                 rs.rand(8, 4, 32, 32, 3).astype(np.float32) * 2 - 1),
             "mask": jnp.zeros((8, 1, 32, 32, 1))
                        .at[:, :, 8:20, 8:20].set(1.0)}
    step = temporal.make_sp_train_step(opt, mesh)
    s2, m = step(temporal.shard_sp_state(mesh, state),
                 temporal.shard_sp_batch(mesh, batch), jax.random.PRNGKey(1))
    assert int(s2.step) == 1
    for k, v in m.items():
        assert np.isfinite(float(v)), k
