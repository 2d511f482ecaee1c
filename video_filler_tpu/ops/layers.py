"""Functional NN layers with Torch-parity semantics, NHWC/TPU-native layout.

The reference builds nets from ``nn.SpatialConvolution`` /
``nn.SpatialFullConvolution`` / ``nn.SpatialBatchNormalization`` (train.lua:79-81).
Here each layer is an (init, apply) pair of pure functions over pytrees:

    params, state = layer.init(key)
    y, new_state  = layer.apply(params, state, x, train=...)

* ``params`` are trained; ``state`` holds BatchNorm running statistics.
* Layout is NHWC (TPU-native; channels-last feeds the MXU lanes directly).
  The reference is NCHW — callers fold video frames into the channel (last)
  axis, same semantics, transposed layout.
* Convs default to bias-free: the reference zeroes every conv bias at the top
  of each train closure (train.lua:279-280), so biases are identically zero.
* Compute dtype is configurable: bf16 on the MXU with activations kept in
  bf16 between layers (half the HBM traffic); params, BN statistics and
  losses stay f32.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Any
State = Any

# Torch BatchNorm defaults (nn.SpatialBatchNormalization).
BN_EPS = 1e-5
BN_MOMENTUM = 0.1

DIMNUMS = ("NHWC", "HWIO", "NHWC")


class Layer(NamedTuple):
    init: Callable[[jax.Array], tuple[Params, State]]
    apply: Callable[..., tuple[jax.Array, State]]


def _conv_init(key, kh, kw, cin, cout, use_bias, w_std=0.02):
    """Reference weight init: conv ~ N(0, 0.02), bias 0 (train.lua:58-62)."""
    w = w_std * jax.random.normal(key, (kh, kw, cin, cout), dtype=jnp.float32)
    p = {"w": w}
    if use_bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def conv2d(cin: int, cout: int, kernel: int = 4, stride: int = 2, padding: int = 1,
           use_bias: bool = False, dtype=jnp.bfloat16) -> Layer:
    """``nn.SpatialConvolution(cin,cout,k,k,s,s,p,p)`` equivalent (cross-correlation).

    Output spatial size: floor((in + 2p - k)/s) + 1.
    """

    def init(key):
        return _conv_init(key, kernel, kernel, cin, cout, use_bias), {}

    def apply(params, state, x, *, train=False):
        # Inputs cast to the compute dtype (bf16 on the MXU); activations STAY
        # in the compute dtype between layers — halving HBM traffic — and are
        # only widened at reductions (BN statistics) and losses.  (No
        # preferred_element_type: mixed primal/cotangent dtypes break the AD
        # transpose rule.)
        y = lax.conv_general_dilated(
            x.astype(dtype), params["w"].astype(dtype),
            window_strides=(stride, stride),
            padding=((padding, padding), (padding, padding)),
            dimension_numbers=DIMNUMS,
        )
        if use_bias:
            y = y + params["b"].astype(dtype)
        return y, state

    return Layer(init, apply)


def _conv_transpose_subpixel(x, w, dtype):
    """4x4/stride-2/pad-1 transposed conv via 4 phase convs + interleave.

    The input-dilated formulation inserts 75% zeros before the conv; the
    sub-pixel decomposition computes only the useful MACs (cf. the
    deconvolution-splitting trick in hardware-GAN literature).  Derivation
    (1D, 0-based, o = 2i - 1 + k):
        y[2m]   = x[m]w[1] + x[m-1]w[3]
        y[2m+1] = x[m+1]w[0] + x[m]w[2]
    i.e. with x padded by 1 on both sides, phase r reads a 2-tap window at
    offset r with kernel taps (w[3-r], w[1-r]) — per axis; 2D composes the
    two axes into 4 phases of (2,2) kernels.  Exactly equal to the dilated
    form (parity-tested against torch conv_transpose2d).
    """
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    outs = []
    for ry in (0, 1):
        for rx in (0, 1):
            # kernel taps: rows (w[3-ry], w[1-ry]), cols likewise
            kern = w[(3 - ry, 1 - ry), :][:, (3 - rx, 1 - rx)]
            xs = xp[:, ry:ry + h + 1, rx:rx + wd + 1, :]
            y = lax.conv_general_dilated(
                xs, kern.astype(dtype), window_strides=(1, 1),
                padding=((0, 0), (0, 0)), dimension_numbers=DIMNUMS)
            outs.append(y)
    # interleave phases: (B, H, W, 4, C) -> (B, 2H, 2W, C)
    y = jnp.stack(outs, axis=3).reshape(b, h, wd, 2, 2, cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * wd, cout)


def conv2d_transpose(cin: int, cout: int, kernel: int = 4, stride: int = 2,
                     padding: int = 1, use_bias: bool = False,
                     dtype=jnp.bfloat16, subpixel: bool = True) -> Layer:
    """``nn.SpatialFullConvolution(cin,cout,k,k,s,s,p,p)`` equivalent.

    Output spatial size: (in-1)*s - 2p + k  — e.g. the 1→4 "valid" decoder head
    (train.lua:134) and the 4x4/stride-2/pad-1 doubling ladder (train.lua:137-146).

    Implemented the TPU way: for the ubiquitous 4x4/stride-2/pad-1 case the
    default is the sub-pixel decomposition (4 dense (2,2) phase convs +
    interleave, `_conv_transpose_subpixel`) — measured 4.3x faster than the
    input-dilated form on v5e (94us -> 22us for the decoder stack at batch 64)
    because the dilated form spends 75% of its MACs on inserted zeros.  Other
    shapes use the input-dilated conv (lhs_dilation=stride) with a spatially
    flipped kernel — the exact transpose of `conv2d`.  Weight layout
    (k,k,cin,cout) in both paths; Torch's ConvTranspose2d weight
    (cin,cout,kH,kW) maps via transpose(2,3,0,1).
    """

    def init(key):
        return _conv_init(key, kernel, kernel, cin, cout, use_bias), {}

    def apply(params, state, x, *, train=False):
        if x.shape[1] == 1 and x.shape[2] == 1 and stride == 1 and padding == 0:
            # 1x1 input (the nBottleneck -> 4x4 decoder head, train.lua:134):
            # the transposed conv degenerates to out[b,h,w,o] = Σ_i x[b,i]·
            # w[h,w,i,o] — a pure MXU matmul, no kernel reverse, no dilation.
            # (Profiling showed the generic path spent 343us/step reversing
            # the (4,4,4000,512) weight.)
            y = jnp.einsum("bi,hwio->bhwo", x[:, 0, 0, :].astype(dtype),
                           params["w"].astype(dtype))
        elif subpixel and kernel == 4 and stride == 2 and padding == 1:
            y = _conv_transpose_subpixel(x, params["w"], dtype)
        else:
            pad = kernel - 1 - padding
            w = params["w"][::-1, ::-1]  # rot180: transpose of correlation
            y = lax.conv_general_dilated(
                x.astype(dtype), w.astype(dtype),
                window_strides=(1, 1),
                padding=((pad, pad), (pad, pad)),
                lhs_dilation=(stride, stride),
                dimension_numbers=DIMNUMS,
            )
        if use_bias:
            y = y + params["b"].astype(y.dtype)
        return y, state

    return Layer(init, apply)


def batch_norm(ch: int, eps: float = BN_EPS, momentum: float = BN_MOMENTUM) -> Layer:
    """``nn.SpatialBatchNormalization(ch)`` with Torch semantics.

    Init: gamma ~ N(1, 0.02), beta = 0 (train.lua:63-66).
    Train: normalize by biased batch variance; running_var updated with the
    *unbiased* estimate (Torch convention). Eval: running statistics.
    Statistics are computed in f32 regardless of compute dtype.
    """

    def init(key):
        params = {
            "gamma": 1.0 + 0.02 * jax.random.normal(key, (ch,), jnp.float32),
            "beta": jnp.zeros((ch,), jnp.float32),
        }
        state = {
            "mean": jnp.zeros((ch,), jnp.float32),
            "var": jnp.ones((ch,), jnp.float32),
        }
        return params, state

    def apply(params, state, x, *, train=False):
        xf = x.astype(jnp.float32)
        if train:
            # Reduce over batch and spatial axes; under pjit the batch axis may
            # be sharded — XLA inserts the psum so these are global statistics.
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            n = math.prod(x.shape[:-1])  # N*H*W samples per channel
            unbiased = var * (n / max(n - 1, 1))
            new_state = {
                "mean": (1 - momentum) * state["mean"] + momentum * mean,
                "var": (1 - momentum) * state["var"] + momentum * unbiased,
            }
        else:
            mean, var = state["mean"], state["var"]
            new_state = state
        inv = lax.rsqrt(var + eps) * params["gamma"]
        y = (xf - mean) * inv + params["beta"]
        return y.astype(x.dtype) if x.dtype != jnp.float32 else y, new_state

    return Layer(init, apply)


def _stateless(fn: Callable[[jax.Array], jax.Array]) -> Layer:
    def init(key):
        return {}, {}

    def apply(params, state, x, *, train=False):
        return fn(x), state

    return Layer(init, apply)


def leaky_relu(slope: float = 0.2) -> Layer:
    """``nn.LeakyReLU(0.2)`` (train.lua:90)."""
    return _stateless(lambda x: jnp.where(x >= 0, x, slope * x))


def relu() -> Layer:
    return _stateless(lambda x: jnp.maximum(x, 0))


def tanh() -> Layer:
    return _stateless(jnp.tanh)


def identity() -> Layer:
    return _stateless(lambda x: x)


def sequential(*named_layers: tuple[str, Layer]) -> Layer:
    """``nn.Sequential`` equivalent; params/state are name-keyed dicts."""
    names = [n for n, _ in named_layers]
    assert len(set(names)) == len(names), f"duplicate layer names: {names}"

    def init(key):
        keys = jax.random.split(key, len(named_layers))
        params, state = {}, {}
        for k, (name, layer) in zip(keys, named_layers):
            p, s = layer.init(k)
            if p:
                params[name] = p
            if s:
                state[name] = s
        return params, state

    def apply(params, state, x, *, train=False):
        new_state = dict(state)
        for name, layer in named_layers:
            x, s = layer.apply(params.get(name, {}), state.get(name, {}), x,
                               train=train)
            if s:
                new_state[name] = s
        return x, new_state

    return Layer(init, apply)
