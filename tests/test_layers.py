"""Golden-parity tests: our layers vs torch CPU reference semantics.

The reference's nets are Torch7 nn modules; torch (PyTorch CPU) implements the
same C-level semantics (SpatialConvolution == Conv2d, SpatialFullConvolution ==
ConvTranspose2d, SpatialBatchNormalization == BatchNorm2d), so PyTorch is our
numerical oracle without copying any reference code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from video_filler_tpu.ops import layers


def _nhwc(t: torch.Tensor) -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _to_torch(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


@pytest.mark.parametrize("stride,pad,size", [(2, 1, 16), (1, 0, 4)])
def test_conv2d_matches_torch(rng, stride, pad, size):
    cin, cout, k = 3, 8, 4
    layer = layers.conv2d(cin, cout, k, stride, pad, dtype=jnp.float32)
    params, state = layer.init(rng)
    x = np.random.RandomState(0).randn(2, size, size, cin).astype(np.float32)

    y, _ = layer.apply(params, state, jnp.asarray(x))

    w = torch.from_numpy(np.asarray(params["w"]).transpose(3, 2, 0, 1))
    ref = F.conv2d(_to_torch(x), w, stride=stride, padding=pad)
    np.testing.assert_allclose(np.asarray(y), _nhwc(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,pad,size,out_size", [(2, 1, 8, 16), (1, 0, 1, 4)])
def test_conv2d_transpose_matches_torch(rng, stride, pad, size, out_size):
    """SpatialFullConvolution: out = (in-1)*s - 2p + k. Covers the 1->4 valid
    decoder head (train.lua:134) and the doubling ladder (train.lua:137)."""
    cin, cout, k = 5, 7, 4
    layer = layers.conv2d_transpose(cin, cout, k, stride, pad, dtype=jnp.float32)
    params, state = layer.init(rng)
    x = np.random.RandomState(1).randn(2, size, size, cin).astype(np.float32)

    y, _ = layer.apply(params, state, jnp.asarray(x))
    assert y.shape == (2, out_size, out_size, cout)

    # torch ConvTranspose2d weight (cin, cout, kh, kw) <- ours (kh, kw, cin, cout)
    w = torch.from_numpy(np.asarray(params["w"]).transpose(2, 3, 0, 1))
    ref = F.conv_transpose2d(_to_torch(x), w, stride=stride, padding=pad)
    np.testing.assert_allclose(np.asarray(y), _nhwc(ref), rtol=1e-4, atol=1e-4)


def test_batch_norm_train_matches_torch(rng):
    ch = 6
    layer = layers.batch_norm(ch)
    params, state = layer.init(rng)
    x = np.random.RandomState(2).randn(4, 8, 8, ch).astype(np.float32) * 3 + 1

    y, new_state = layer.apply(params, state, jnp.asarray(x), train=True)

    bn = torch.nn.BatchNorm2d(ch, eps=layers.BN_EPS, momentum=layers.BN_MOMENTUM)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(np.asarray(params["gamma"])))
        bn.bias.copy_(torch.from_numpy(np.asarray(params["beta"])))
    bn.train()
    ref = bn(_to_torch(x))
    np.testing.assert_allclose(np.asarray(y), _nhwc(ref), rtol=1e-4, atol=1e-4)
    # Torch running stats: biased mean, unbiased var, momentum 0.1.
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               bn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               bn.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_batch_norm_eval_uses_running_stats(rng):
    ch = 4
    layer = layers.batch_norm(ch)
    params, state = layer.init(rng)
    state = {"mean": jnp.full((ch,), 2.0), "var": jnp.full((ch,), 4.0)}
    x = jnp.full((1, 2, 2, ch), 4.0)
    y, out_state = layer.apply(params, state, x, train=False)
    expected = (4.0 - 2.0) / np.sqrt(4.0 + layers.BN_EPS)
    want = np.broadcast_to(
        expected * np.asarray(params["gamma"]) + np.asarray(params["beta"]),
        y.shape)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4)
    assert out_state is state


def test_leaky_relu():
    layer = layers.leaky_relu(0.2)
    y, _ = layer.apply({}, {}, jnp.asarray([-1.0, 0.0, 2.0]))
    np.testing.assert_allclose(np.asarray(y), [-0.2, 0.0, 2.0])


def test_weight_init_distribution(rng):
    """train.lua:58-67: conv ~ N(0,0.02); BN gamma ~ N(1,0.02), beta 0."""
    conv = layers.conv2d(64, 128, 4)
    p, _ = conv.init(rng)
    assert abs(float(jnp.std(p["w"])) - 0.02) < 0.002
    assert abs(float(jnp.mean(p["w"]))) < 0.002
    bn = layers.batch_norm(256)
    pb, sb = bn.init(rng)
    assert abs(float(jnp.mean(pb["gamma"])) - 1.0) < 0.01
    assert float(jnp.max(jnp.abs(pb["beta"]))) == 0.0
    assert float(jnp.max(jnp.abs(sb["mean"]))) == 0.0


def test_sequential_threads_state(rng):
    net = layers.sequential(
        ("conv", layers.conv2d(3, 4, 4, 2, 1, dtype=jnp.float32)),
        ("bn", layers.batch_norm(4)),
        ("act", layers.leaky_relu()),
    )
    params, state = net.init(rng)
    x = jnp.ones((2, 8, 8, 3))
    y, new_state = net.apply(params, state, x, train=True)
    assert y.shape == (2, 4, 4, 4)
    assert not np.allclose(np.asarray(new_state["bn"]["mean"]),
                           np.asarray(state["bn"]["mean"]))


def test_conv2d_transpose_subpixel_equals_dilated(rng):
    """The default sub-pixel decomposition must match the input-dilated form
    (and therefore torch) exactly, including the degenerate 1x1 input."""
    for size in (1, 8, 32):
        sub = layers.conv2d_transpose(5, 7, 4, 2, 1, dtype=jnp.float32,
                                      subpixel=True)
        dil = layers.conv2d_transpose(5, 7, 4, 2, 1, dtype=jnp.float32,
                                      subpixel=False)
        p, s = sub.init(rng)
        x = jnp.asarray(np.random.RandomState(size).randn(2, size, size, 5)
                        .astype(np.float32))
        y1, _ = sub.apply(p, s, x)
        y2, _ = dil.apply(p, s, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   rtol=1e-5, atol=1e-6)


def test_conv2d_transpose_subpixel_gradients(rng):
    """Autodiff through the sub-pixel path equals the dilated path."""
    sub = layers.conv2d_transpose(3, 4, 4, 2, 1, dtype=jnp.float32,
                                  subpixel=True)
    dil = layers.conv2d_transpose(3, 4, 4, 2, 1, dtype=jnp.float32,
                                  subpixel=False)
    p, _ = sub.init(rng)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3)
                    .astype(np.float32))

    def loss(apply, p, x):
        y, _ = apply(p, {}, x)
        return jnp.sum(y * y)

    g1 = jax.grad(lambda p: loss(sub.apply, p, x))(p)
    g2 = jax.grad(lambda p: loss(dil.apply, p, x))(p)
    np.testing.assert_allclose(np.asarray(g1["w"]), np.asarray(g2["w"]),
                               rtol=1e-4, atol=1e-5)
    gx1 = jax.grad(lambda x: loss(sub.apply, p, x))(x)
    gx2 = jax.grad(lambda x: loss(dil.apply, p, x))(x)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-4, atol=1e-5)
