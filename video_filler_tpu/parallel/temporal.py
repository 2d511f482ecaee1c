"""Sequence (temporal) parallelism for the 3D family — shard_map + halos.

The reference has no sequence dimension at all ("sequence" = channel-folded
frames, SURVEY §5); the video3d family (models/context_encoder_3d.py) gives
clips a real T axis, and this module shards it across devices: each shard
holds a contiguous frame chunk, and the temporal-kernel-3 convs exchange
single-frame halos with their neighbors over ICI (``lax.ppermute``) instead of
materializing the full clip anywhere.

Pieces, bottom-up:

* ``temporal_conv3d_sp`` — the raw primitive: conv3d with kernel (3,kh,kw) /
  temporal stride 1 / temporal pad 1 over a (B, T/n, H, W, C)-sharded clip.
  Boundary shards get zero halos — ppermute's fill-with-zero for edges IS the
  zero padding, so the result is bit-equal to the unsharded conv.
* ``sp_conv3d`` / ``sp_conv3d_transpose`` — the same halo exchange packaged as
  differentiable ``Layer``s (drop-in for ops/layers3d convs with temporal
  kernel 3/stride 1/pad 1); shard_map transposes ppermute in the backward, so
  gradients flow with the same neighbor-only communication pattern.
* ``make_sp_train_step`` — the FULL fused GAN train step over a
  ('data','seq') mesh: G and D run halo-exchange convs on T-sharded
  activations; the T-collapsing bottleneck stage gathers T (tiny: T x 4 x 4
  activations) and shards the giant bottleneck matmuls over 'seq' instead
  (TP-in-the-middle); BatchNorm statistics and losses reduce over global
  arrays under jit, so XLA psums them over BOTH mesh axes — DP-and-SP-global
  statistics with no hand-written collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_filler_tpu.ops.layers import Layer

SEQ_AXIS = "seq"
DATA_AXIS = "data"


def make_seq_mesh(n_data: int, n_seq: int, devices=None) -> Mesh:
    """A ('data','seq') mesh for sequence-parallel 3D training/inference."""
    import numpy as np

    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data < 1 or n_seq < 1:
        raise ValueError(f"mesh axes must be >=1, got {n_data}x{n_seq}")
    if n_data * n_seq > devices.size:
        raise ValueError(
            f"seq mesh data:{n_data} x seq:{n_seq} = {n_data * n_seq} "
            f"devices, but only {devices.size} available")
    from video_filler_tpu.parallel.mesh import _device_grid
    grid = _device_grid(devices[: n_data * n_seq], (n_data, n_seq))
    return Mesh(grid, (DATA_AXIS, SEQ_AXIS))


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
        in_specs=(P(DATA_AXIS, SEQ_AXIS), P()),
        out_specs=P(DATA_AXIS, SEQ_AXIS))
    return fn(x, w)


def shard_clip(mesh: Mesh, x: jax.Array) -> jax.Array:
    """device_put a (B, T, H, W, C) clip sharded (data, seq)."""
    return jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS)))


# ---------------------------------------------------------------------------
# Layer-level SP convs (drop-ins for ops/layers3d with temporal k=3/s=1/p=1)
# ---------------------------------------------------------------------------

def _sp_layer(mesh: Mesh, plain: Layer, kernel_fn, use_bias: bool) -> Layer:
    """Package a per-shard conv kernel as a Layer: shard_map over
    ('data','seq'), params/init shared with the equivalent plain layer (so
    SP and non-SP builds have identical trees and init draws)."""
    fn = jax.shard_map(kernel_fn, mesh=mesh,
                       in_specs=(P(DATA_AXIS, SEQ_AXIS), P()),
                       out_specs=P(DATA_AXIS, SEQ_AXIS))

    def apply(params, state, x, *, train=False):
        y = fn(x, params["w"])
        if use_bias:
            y = y + params["b"].astype(y.dtype)
        return y, state

    return Layer(plain.init, apply)


def sp_conv3d(mesh: Mesh, cin: int, cout: int, kernel=(3, 4, 4),
              stride=(1, 2, 2), padding=(1, 1, 1), use_bias: bool = False,
              dtype=jnp.bfloat16) -> Layer:
    """ops/layers3d.conv3d with the T axis sharded over the mesh's 'seq' axis.

    Same params/semantics as conv3d(kernel=(3,kh,kw), stride=(1,sh,sw),
    padding=(1,ph,pw)); the temporal zero padding is realized by the halo
    exchange's zero boundary fill.  Differentiable: shard_map transposes the
    ppermute, so the weight gradient is psum'd over both mesh axes and the
    input cotangent flows back through the mirrored halo pattern.
    """
    from video_filler_tpu.ops.layers3d import conv3d

    _, sh, sw = stride
    _, ph, pw = padding
    assert (kernel[0], stride[0], padding[0]) == (3, 1, 1), \
        "sp_conv3d supports temporal kernel 3 / stride 1 / pad 1"

    def kernel_fn(x_local, w):
        xp = _halo_exchange(x_local.astype(dtype), SEQ_AXIS)
        return lax.conv_general_dilated(
            xp, w.astype(dtype),
            window_strides=(1, sh, sw),
            padding=((0, 0), (ph, ph), (pw, pw)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    plain = conv3d(cin, cout, kernel, stride, padding, use_bias, dtype)
    return _sp_layer(mesh, plain, kernel_fn, use_bias)


def sp_conv3d_transpose(mesh: Mesh, cin: int, cout: int, kernel=(3, 4, 4),
                        stride=(1, 2, 2), padding=(1, 1, 1),
                        use_bias: bool = False, dtype=jnp.bfloat16) -> Layer:
    """ops/layers3d.conv3d_transpose with the T axis sharded over 'seq'.

    Temporal k=3/s=1/p=1 transposed conv == regular conv with the reversed
    kernel and pad 1 — exactly one halo frame per side; spatial upsampling
    stays the input-dilated form.  out T == in T per shard (no reshard)."""
    from video_filler_tpu.ops.layers3d import conv3d_transpose

    kh, kw = kernel[1], kernel[2]
    _, sh, sw = stride
    _, ph, pw = padding
    assert (kernel[0], stride[0], padding[0]) == (3, 1, 1), \
        "sp_conv3d_transpose supports temporal kernel 3 / stride 1 / pad 1"

    def kernel_fn(x_local, w):
        xp = _halo_exchange(x_local.astype(dtype), SEQ_AXIS)
        wr = w[::-1, ::-1, ::-1]  # full reverse: transpose of correlation
        return lax.conv_general_dilated(
            xp, wr.astype(dtype),
            window_strides=(1, 1, 1),
            padding=((0, 0), (kh - 1 - ph,) * 2, (kw - 1 - pw,) * 2),
            lhs_dilation=(1, sh, sw),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    plain = conv3d_transpose(cin, cout, kernel, stride, padding, use_bias,
                             dtype)
    return _sp_layer(mesh, plain, kernel_fn, use_bias)


# ---------------------------------------------------------------------------
# Full sequence-parallel train step
# ---------------------------------------------------------------------------

def make_sp_train_step(opt, mesh: Mesh, with_init: bool = False):
    """The video3d fused GAN step with clips T-sharded over mesh axis 'seq'.

    Same semantics as make_train_step(opt, 'video3d') — identical gradients
    and metrics (CPU-mesh equivalence test) — but every temporal conv runs
    halo-exchange SP and the bottleneck matmuls are sharded over 'seq'.
    Returns a jitted step(state, batch, key) -> (state, metrics); shard the
    inputs with shard_sp_state / shard_sp_batch first.
    """
    from video_filler_tpu.train.step import make_train_step

    return jax.jit(make_train_step(opt, "video3d", with_init=with_init,
                                   sp_mesh=mesh),
                   donate_argnums=0)


def shard_sp_state(mesh: Mesh, state):
    """Replicate the TrainState over the ('data','seq') mesh (params are
    small; the sharded things are activations).  Goes through the
    multi-process-safe builder: a plain device_put to a mesh spanning
    processes reshards through cross-process programs (mesh.py)."""
    from video_filler_tpu.parallel.mesh import put_with_shardings
    sharding = NamedSharding(mesh, P())
    return put_with_shardings(state, jax.tree.map(lambda _: sharding, state))


def shard_sp_batch(mesh: Mesh, batch):
    """real (B,T,H,W,C) -> (data, seq); mask (B,1,H,W,1) -> (data,) — its
    broadcast T axis has size 1 and cannot shard."""
    def put(k, x):
        if k == "real":
            return jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS,
                                                           SEQ_AXIS)))
        return jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))
    return {k: put(k, v) for k, v in batch.items()}


def shard_sp_host_batch(mesh: Mesh, batch, nc: int = 3):
    """Device_put the loader's uint8 video batch for the SP train step.

    The folded channel axis of ``raw`` (B, H, W, nc*T) is T-major (frame t
    owns channels [t*nc, (t+1)*nc) — pipeline.video_sampler), so sharding it
    over 'seq' places each device's own frames locally: the in-jit
    ``unfold_time`` reshape then yields the (data, seq)-sharded clip without
    replicating every row to all seq devices first (over a remote-TPU link
    that replication multiplies the host->device transfer by n_seq).

    ``nc`` (channels per frame) guards FRAME alignment: n_seq dividing the
    folded channel count nc*T is not enough — e.g. nc=3, T=4, n_seq=6
    divides 12 but would shard mid-frame, silently defeating the locality
    this function promises.  The real requirement is n_seq | T."""
    raw = batch["raw"]
    n_seq = mesh.shape[SEQ_AXIS]
    per_shard, rem = divmod(raw.shape[-1], n_seq)
    if rem or per_shard % nc:
        raise ValueError(
            f"folded channels {raw.shape[-1]} over seq axis {n_seq} give "
            f"{raw.shape[-1] / n_seq:g} channels per shard — not a multiple "
            f"of nc={nc}: seqParallel must divide the clip's frame count T "
            f"(= {raw.shape[-1] // nc}) so shards split on frame boundaries")

    def put(k, x):
        if k == "raw":
            spec = P(DATA_AXIS, None, None, SEQ_AXIS)
        elif x.ndim >= 1 and x.shape[0] == raw.shape[0]:
            spec = P(DATA_AXIS)          # batched mask
        else:
            spec = P()                   # unbatched (shared) mask
        return jax.device_put(x, NamedSharding(mesh, spec))

    return {k: put(k, v) for k, v in batch.items()}
