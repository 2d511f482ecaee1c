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
* Compute dtype is configurable (bf16 on the MXU with f32 accumulation via
  ``preferred_element_type``); params and BN statistics stay f32.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple, Sequence

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
        # Inputs cast to the compute dtype (bf16 on the MXU); the result is
        # upcast to f32 outside the conv rather than via preferred_element_type
        # so the AD transpose sees consistent dtypes.
        y = lax.conv_general_dilated(
            x.astype(dtype), params["w"].astype(dtype),
            window_strides=(stride, stride),
            padding=((padding, padding), (padding, padding)),
            dimension_numbers=DIMNUMS,
        ).astype(jnp.float32)
        if use_bias:
            y = y + params["b"]
        return y, state

    return Layer(init, apply)


def conv2d_transpose(cin: int, cout: int, kernel: int = 4, stride: int = 2,
                     padding: int = 1, use_bias: bool = False,
                     dtype=jnp.bfloat16) -> Layer:
    """``nn.SpatialFullConvolution(cin,cout,k,k,s,s,p,p)`` equivalent.

    Output spatial size: (in-1)*s - 2p + k  — e.g. the 1→4 "valid" decoder head
    (train.lua:134) and the 4x4/stride-2/pad-1 doubling ladder (train.lua:137-146).

    Implemented the TPU way: an input-dilated conv (lhs_dilation=stride) with a
    spatially flipped kernel — exactly the transpose of `conv2d`, lowered by XLA
    to the same MXU path as a forward conv.  Weight layout (k,k,cin,cout);
    Torch's ConvTranspose2d weight (cin,cout,kH,kW) maps via transpose(2,3,0,1).
    """

    def init(key):
        return _conv_init(key, kernel, kernel, cin, cout, use_bias), {}

    def apply(params, state, x, *, train=False):
        pad = kernel - 1 - padding
        w = params["w"][::-1, ::-1]  # rot180: transpose of cross-correlation
        y = lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(stride, stride),
            dimension_numbers=DIMNUMS,
        ).astype(jnp.float32)
        if use_bias:
            y = y + params["b"]
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
