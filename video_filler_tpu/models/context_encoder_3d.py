"""Temporal (3D-conv) context-encoder variant — the TPU-native upgrade of the
reference's channel-folded video model.

The reference represents a clip as nc*predLen channels through 2D convs
(train_vid_weighted.lua:96-176); frames only interact via the first conv's
channel mixing.  This family keeps the same encoder-bottleneck-decoder shape
and loss semantics but convolves over (T, H, W) with kernel 3 in time, giving
a real temporal receptive field at every level — the "temporally-stacked 3D
conv kernels" of the BASELINE north star.  Input/output: (B, T, S, S, nc)
in [-1, 1] with S = 4 * 2**levels (128 at the default 5 levels);
ops/layers3d.fold_time/unfold_time convert to/from the reference's channel
representation.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from jax.sharding import NamedSharding, PartitionSpec as P

from video_filler_tpu.ops.layers import (
    Layer,
    batch_norm,
    leaky_relu,
    relu,
    sequential,
    tanh,
)
from video_filler_tpu.ops.layers3d import conv3d, conv3d_transpose


@dataclasses.dataclass(frozen=True)
class Video3DSpec:
    nc: int = 3
    pred_len: int = 4
    nef: int = 64
    ngf: int = 64
    ndf: int = 64
    n_bottleneck: int = 4000
    levels: int = 5            # spatial halvings; input size = 4 * 2**levels
    use_bias: bool = False
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def fine_size(self) -> int:
        return 4 * 2 ** self.levels


def _enc_widths(base: int, levels: int) -> list[int]:
    """Reference channel ladder: nef, nef, 2nef, 4nef, 8nef (train.lua:87-103),
    generalized to any depth (doubling, capped at 8x)."""
    return [base * min(2 ** max(i - 1, 0), 8) for i in range(levels)]


def _constrain_in(layer: Layer, mesh, spec: P) -> Layer:
    """Apply a sharding constraint to the layer's input (same init/params —
    param-tree names and key splits are untouched, preserving checkpoints)."""
    def apply(params, state, x, *, train=False):
        x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
        return layer.apply(params, state, x, train=train)
    return Layer(layer.init, apply)


def _constrain_out(layer: Layer, mesh, spec: P) -> Layer:
    def apply(params, state, x, *, train=False):
        y, s = layer.apply(params, state, x, train=train)
        return jax.lax.with_sharding_constraint(y, NamedSharding(mesh, spec)), s
    return Layer(layer.init, apply)


def _conv_factories(spec: Video3DSpec, sp_mesh):
    """(conv, convT) for the (3,4,4)/(1,2,2)/(1,1,1) stages: plain conv3d
    layers, or halo-exchange sequence-parallel variants when sp_mesh is a
    ('data','seq') mesh (parallel/temporal.py).  Identical init in both."""
    dt, ub = spec.compute_dtype, spec.use_bias
    if sp_mesh is None:
        conv = lambda ci, co: conv3d(ci, co, (3, 4, 4), (1, 2, 2), (1, 1, 1),
                                     ub, dt)
        convT = lambda ci, co: conv3d_transpose(ci, co, (3, 4, 4), (1, 2, 2),
                                                (1, 1, 1), ub, dt)
        return conv, convT
    from video_filler_tpu.parallel import temporal as sp
    conv = lambda ci, co: sp.sp_conv3d(sp_mesh, ci, co, (3, 4, 4), (1, 2, 2),
                                       (1, 1, 1), ub, dt)
    convT = lambda ci, co: sp.sp_conv3d_transpose(sp_mesh, ci, co, (3, 4, 4),
                                                  (1, 2, 2), (1, 1, 1), ub, dt)
    return conv, convT


def build_generator3d(spec: Video3DSpec, sp_mesh=None) -> Layer:
    """Encoder: `levels` x (3,4,4)/(1,2,2) conv3d stages down to 4², then a
    (T,4,4)-valid conv to the 1x1x1 bottleneck; decoder mirrors back to
    (T, S, S, nc) with Tanh.

    With ``sp_mesh`` (a ('data','seq') Mesh) the clip's T axis is sharded over
    'seq': every temporal-kernel-3 conv runs halo-exchange SP; the
    T-collapsing bottleneck conv gathers T (a tiny T x 4 x 4 activation) and
    its nBottleneck output channels shard over 'seq' instead, putting the two
    giant matmuls + bott_bn on the seq devices (TP-in-the-middle); the first
    decoder stage re-shards T on its way out.
    """
    nef, ngf, dt, ub = spec.nef, spec.ngf, spec.compute_dtype, spec.use_bias
    t = spec.pred_len
    widths = _enc_widths(nef, spec.levels)
    conv, convT = _conv_factories(spec, sp_mesh)

    enc_layers: list[tuple[str, Layer]] = []
    cin = spec.nc
    for i, w in enumerate(widths):
        enc_layers.append((f"conv{i}", conv(cin, w)))
        if i > 0:
            enc_layers.append((f"bn{i}", batch_norm(w)))
        enc_layers.append((f"lrelu{i}", leaky_relu(0.2)))
        cin = w
    bott_conv = conv3d(cin, spec.n_bottleneck, (t, 4, 4), (1, 1, 1),
                       (0, 0, 0), ub, dt)
    if sp_mesh is not None:
        bott_conv = _constrain_out(
            _constrain_in(bott_conv, sp_mesh, P("data")),
            sp_mesh, P("data", None, None, None, "seq"))
    enc_layers.append((f"conv{len(widths)}", bott_conv))
    enc = sequential(*enc_layers)

    dec_widths = [ngf * min(2 ** i, 8) for i in range(spec.levels - 1)][::-1]
    up0 = conv3d_transpose(spec.n_bottleneck,
                           dec_widths[0] if dec_widths else ngf,
                           (t, 4, 4), (1, 1, 1), (0, 0, 0), ub, dt)
    if sp_mesh is not None:
        up0 = _constrain_out(up0, sp_mesh, P("data", "seq"))
    dec_layers: list[tuple[str, Layer]] = [
        ("up0", up0),
        ("bn0", batch_norm(dec_widths[0] if dec_widths else ngf)),
        ("relu0", relu()),
    ]
    cin = dec_widths[0] if dec_widths else ngf
    for i, w in enumerate(dec_widths[1:] + [ngf]):
        dec_layers.append((f"up{i + 1}", convT(cin, w)))
        dec_layers.append((f"bn{i + 1}", batch_norm(w)))
        dec_layers.append((f"relu{i + 1}", relu()))
        cin = w
    dec_layers.append((f"up{spec.levels}", convT(cin, spec.nc)))
    dec_layers.append(("tanh", tanh()))
    dec = sequential(*dec_layers)

    bott_bn = batch_norm(spec.n_bottleneck)
    bott_act = leaky_relu(0.2)

    def init(key):
        k_enc, k_bn, k_dec = jax.random.split(key, 3)
        params, state = {}, {}
        params["enc"], state["enc"] = enc.init(k_enc)
        params["bott_bn"], state["bott_bn"] = bott_bn.init(k_bn)
        params["dec"], state["dec"] = dec.init(k_dec)
        return params, state

    def apply(params, state, x, *, train=False):
        new_state = dict(state)
        h, new_state["enc"] = enc.apply(params["enc"], state["enc"], x,
                                        train=train)
        h, new_state["bott_bn"] = bott_bn.apply(params["bott_bn"],
                                                state["bott_bn"], h,
                                                train=train)
        h, _ = bott_act.apply({}, {}, h)
        y, new_state["dec"] = dec.apply(params["dec"], state["dec"], h,
                                        train=train)
        return y, new_state

    return Layer(init, apply)


def build_discriminator3d(spec: Video3DSpec, sp_mesh=None) -> Layer:
    """3D patch discriminator: (B,T,S,S,nc) -> (B,) logits.  BN-free two-conv
    head like the 128-in 2D variant (train_vid_weighted.lua:216-227).
    With sp_mesh, temporal convs are sequence-parallel and the T-collapsing
    head gathers T first (see build_generator3d)."""
    ndf, dt, ub = spec.ndf, spec.compute_dtype, spec.use_bias
    t = spec.pred_len
    conv, _ = _conv_factories(spec, sp_mesh)
    layers: list[tuple[str, Layer]] = [
        ("conv0", conv(spec.nc, ndf // 2)),
        ("lrelu0", leaky_relu(0.2)),
        ("conv1", conv(ndf // 2, ndf)),
        ("lrelu1", leaky_relu(0.2)),
    ]
    cin = ndf
    # remaining stages halve down to 4² (input is 2x the 2D D's 64², so two
    # head convs + (levels-2) BN stages)
    for i in range(2, spec.levels):
        w = ndf * min(2 ** (i - 1), 8)
        layers.append((f"conv{i}", conv(cin, w)))
        layers.append((f"bn{i}", batch_norm(w)))
        layers.append((f"lrelu{i}", leaky_relu(0.2)))
        cin = w
    head = conv3d(cin, 1, (t, 4, 4), (1, 1, 1), (0, 0, 0), ub, dt)
    if sp_mesh is not None:
        head = _constrain_in(head, sp_mesh, P("data"))
    layers.append((f"conv{spec.levels}", head))
    net = sequential(*layers)

    def init(key):
        return net.init(key)

    def apply(params, state, x, *, train=False):
        y, s = net.apply(params, state, x, train=train)
        return y.reshape(y.shape[0]), s

    return Layer(init, apply)
