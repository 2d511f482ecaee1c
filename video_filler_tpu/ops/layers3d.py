"""3D (temporal) conv layers — NDHWC layout.

The reference folds predLen frames into channels and stays 2D
(train_vid_weighted.lua:96); the BASELINE north star calls for
"temporally-stacked 3D conv kernels" as the TPU upgrade path, and SURVEY §5
planned the layout so this is an extension, not a redesign.  These layers give
the video regime a true temporal receptive field: clips are (B, T, H, W, C)
and convs carry a temporal kernel.

Same conventions as ops/layers.py: bias-free by default, N(0,0.02) init,
bf16 compute with bf16 activations, BatchNorm reuses the rank-generic 2D
implementation (it reduces over all axes but channels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from video_filler_tpu.ops.layers import Layer

DIMNUMS3D = ("NDHWC", "DHWIO", "NDHWC")


def _triple(v):
    return (v, v, v) if isinstance(v, int) else tuple(v)


def conv3d(cin: int, cout: int, kernel=(3, 4, 4), stride=(1, 2, 2),
           padding=(1, 1, 1), use_bias: bool = False,
           dtype=jnp.bfloat16) -> Layer:
    """3D cross-correlation; kernel/stride/padding are (T, H, W) triples."""
    kt, kh, kw = _triple(kernel)
    st = _triple(stride)
    pt, ph, pw = _triple(padding)

    def init(key):
        w = 0.02 * jax.random.normal(key, (kt, kh, kw, cin, cout),
                                     dtype=jnp.float32)
        p = {"w": w}
        if use_bias:
            p["b"] = jnp.zeros((cout,), jnp.float32)
        return p, {}

    def apply(params, state, x, *, train=False):
        y = lax.conv_general_dilated(
            x.astype(dtype), params["w"].astype(dtype),
            window_strides=st,
            padding=((pt, pt), (ph, ph), (pw, pw)),
            dimension_numbers=DIMNUMS3D,
        )
        if use_bias:
            y = y + params["b"].astype(y.dtype)
        return y, state

    return Layer(init, apply)


def conv3d_transpose(cin: int, cout: int, kernel=(3, 4, 4), stride=(1, 2, 2),
                     padding=(1, 1, 1), use_bias: bool = False,
                     dtype=jnp.bfloat16) -> Layer:
    """3D transposed conv: out_dim = (in-1)*s - 2p + k per axis.

    Input-dilated formulation with a fully reversed kernel — the exact
    transpose of `conv3d`.  Weight layout (kT,kH,kW,cin,cout).
    """
    kt, kh, kw = _triple(kernel)
    s = _triple(stride)
    pt, ph, pw = _triple(padding)

    def init(key):
        w = 0.02 * jax.random.normal(key, (kt, kh, kw, cin, cout),
                                     dtype=jnp.float32)
        p = {"w": w}
        if use_bias:
            p["b"] = jnp.zeros((cout,), jnp.float32)
        return p, {}

    def apply(params, state, x, *, train=False):
        if x.shape[1] == 1 and x.shape[2] == 1 and x.shape[3] == 1 \
                and s == (1, 1, 1) and (pt, ph, pw) == (0, 0, 0):
            # 1x1x1 bottleneck head: pure matmul (cf. the 2D einsum path).
            y = jnp.einsum("bi,thwio->bthwo",
                           x[:, 0, 0, 0, :].astype(dtype),
                           params["w"].astype(dtype))
        else:
            w = params["w"][::-1, ::-1, ::-1]
            pads = [(kt - 1 - pt,) * 2, (kh - 1 - ph,) * 2, (kw - 1 - pw,) * 2]
            y = lax.conv_general_dilated(
                x.astype(dtype), w.astype(dtype),
                window_strides=(1, 1, 1),
                padding=pads,
                lhs_dilation=s,
                dimension_numbers=DIMNUMS3D,
            )
        if use_bias:
            y = y + params["b"].astype(y.dtype)
        return y, state

    return Layer(init, apply)


def fold_time(x: jax.Array) -> jax.Array:
    """(B, T, H, W, C) -> (B, H, W, T*C) channel folding (the reference's
    2D representation, datavid/donkey_folder.lua:81-85)."""
    b, t, h, w, c = x.shape
    return x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)


def unfold_time(x: jax.Array, frames: int) -> jax.Array:
    """(B, H, W, T*C) -> (B, T, H, W, C): inverse of fold_time."""
    b, h, w, tc = x.shape
    c = tc // frames
    return x.reshape(b, h, w, frames, c).transpose(0, 3, 1, 2, 4)
