"""Sequence (temporal) parallelism for the 3D family — shard_map + halos.

The reference has no sequence dimension at all ("sequence" = channel-folded
frames, SURVEY §5); the video3d family (models/context_encoder_3d.py) gives
clips a real T axis, and this module shards it across devices: each shard
holds a contiguous frame chunk, and the temporal-kernel-3 convs exchange
single-frame halos with their neighbors over ICI (``lax.ppermute``) instead of
materializing the full clip anywhere.

This is the building block: `temporal_conv3d_sp` == `ops.layers3d.conv3d`
with kernel (3,kh,kw)/stride (1,sh,sw)/temporal pad 1, for inputs sharded
(B, T/n, H, W, C) over a mesh axis.  Boundary shards get zero halos —
ppermute's fill-with-zero for edges IS the zero padding, so the result is
bit-equal to the unsharded conv (tested on the virtual CPU mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SEQ_AXIS = "seq"


def make_seq_mesh(n_data: int, n_seq: int, devices=None) -> Mesh:
    """A ('data','seq') mesh for sequence-parallel 3D training/inference."""
    import numpy as np

    devices = np.asarray(devices if devices is not None else jax.devices())
    grid = devices[: n_data * n_seq].reshape(n_data, n_seq)
    return Mesh(grid, ("data", SEQ_AXIS))


def _halo_exchange(x_local: jax.Array, axis_name: str) -> jax.Array:
    """Concatenate the left neighbor's last frame and the right neighbor's
    first frame around the local chunk (zeros at the clip boundaries —
    unreceived ppermute slots are zero-filled, which is exactly the conv's
    zero padding)."""
    n = lax.axis_size(axis_name)
    left = lax.ppermute(x_local[:, -1:], axis_name,
                        [(i, i + 1) for i in range(n - 1)])
    right = lax.ppermute(x_local[:, :1], axis_name,
                         [(i, i - 1) for i in range(1, n)])
    return jnp.concatenate([left, x_local, right], axis=1)


def temporal_conv3d_sp(mesh: Mesh, x: jax.Array, w: jax.Array,
                       stride_hw: tuple[int, int] = (2, 2),
                       padding_hw: tuple[int, int] = (1, 1),
                       dtype=jnp.float32) -> jax.Array:
    """conv3d with kernel (3,kh,kw), temporal stride 1 / pad 1, over a
    T-sharded clip.  x: (B, T, H, W, C) with T divisible by the seq axis;
    w: (3, kh, kw, cin, cout).  Returns the NHWC'-sharded output, numerically
    identical to the unsharded ops.layers3d.conv3d."""
    assert w.shape[0] == 3, "temporal halo exchange is sized for kernel_t=3"

    def kernel(x_local, w):
        xp = _halo_exchange(x_local.astype(dtype), SEQ_AXIS)
        ph, pw = padding_hw
        return lax.conv_general_dilated(
            xp, w.astype(dtype),
            window_strides=(1, *stride_hw),
            padding=((0, 0), (ph, ph), (pw, pw)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    fn = jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(P("data", SEQ_AXIS), P()),
        out_specs=P("data", SEQ_AXIS))
    return fn(x, w)


def shard_clip(mesh: Mesh, x: jax.Array) -> jax.Array:
    """device_put a (B, T, H, W, C) clip sharded (data, seq)."""
    return jax.device_put(x, NamedSharding(mesh, P("data", SEQ_AXIS)))
