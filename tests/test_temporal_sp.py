"""Sequence-parallel temporal conv: halo-exchange correctness on the
virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from video_filler_tpu.ops import layers3d
from video_filler_tpu.parallel import temporal


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
