"""Loss parity vs torch criteria and the reference's hand-built gradient blends."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from video_filler_tpu.ops import losses


def test_bce_matches_torch():
    rs = np.random.RandomState(0)
    logits = rs.randn(16).astype(np.float32)
    for target in (0.0, 1.0):
        ours = float(losses.bce_with_logits(jnp.asarray(logits), target))
        ref = F.binary_cross_entropy(torch.sigmoid(torch.from_numpy(logits)),
                                     torch.full((16,), target))
        np.testing.assert_allclose(ours, float(ref), rtol=1e-4)


def test_mse_matches_torch():
    rs = np.random.RandomState(1)
    a = rs.randn(2, 8, 8, 3).astype(np.float32)
    b = rs.randn(2, 8, 8, 3).astype(np.float32)
    ours = float(losses.mse(jnp.asarray(a), jnp.asarray(b)))
    ref = F.mse_loss(torch.from_numpy(a), torch.from_numpy(b))
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_weighted_mse_gradient_matches_reference_blend():
    """grad == 2*W*(x-y)/numel — the reference's df_dg_l2 .* wtl2Matrix
    (train.lua:394) / df_dg_l2 .* weights (train_vid_weighted.lua:497)."""
    rs = np.random.RandomState(2)
    x = rs.randn(2, 4, 4, 3).astype(np.float32)
    y = rs.randn(2, 4, 4, 3).astype(np.float32)
    w = rs.rand(2, 4, 4, 3).astype(np.float32)
    grad = jax.grad(lambda p: losses.weighted_mse(p, jnp.asarray(y),
                                                  jnp.asarray(w)))(jnp.asarray(x))
    expected = 2.0 * w * (x - y) / x.size
    np.testing.assert_allclose(np.asarray(grad), expected, rtol=1e-5, atol=1e-6)


def test_mask_l2_weights():
    """weights = mask*(1-λ)+λ (train_vid_weighted.lua:494-495)."""
    mask = jnp.asarray([[0.0, 1.0]])
    w = losses.mask_l2_weights(mask, 0.05)
    np.testing.assert_allclose(np.asarray(w), [[0.05, 1.0]], rtol=1e-6)


def test_masked_mse_criterion():
    """nn.MaskedMSECriterion: mean(((1-w)M + w)(x-y)^2) (MaskedMSECriterion.lua)."""
    rs = np.random.RandomState(3)
    x = rs.randn(2, 4, 4, 3).astype(np.float32)
    y = rs.randn(2, 4, 4, 3).astype(np.float32)
    m = (rs.rand(2, 4, 4, 3) > 0.5).astype(np.float32)
    mw = 0.3
    ours = float(losses.masked_mse(jnp.asarray(x), jnp.asarray(y),
                                   jnp.asarray(m), mw))
    expected = np.mean(((1 - mw) * m + mw) * (x - y) ** 2)
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_overlap_l2_weights_ring():
    """wtl2Matrix: 10x ring of width overlapPred, interior wtl2 (train.lua:391-392)."""
    w = np.asarray(losses.overlap_l2_weights((8, 8), 2, 0.999))
    assert w.shape == (8, 8, 1)
    np.testing.assert_allclose(w[0, 0, 0], 9.99, rtol=1e-5)
    np.testing.assert_allclose(w[1, 4, 0], 9.99, rtol=1e-5)
    np.testing.assert_allclose(w[2, 2, 0], 0.999, rtol=1e-5)
    np.testing.assert_allclose(w[5, 5, 0], 0.999, rtol=1e-5)
    np.testing.assert_allclose(w[6, 3, 0], 9.99, rtol=1e-5)


def test_overlap_l2_weights_zero_overlap():
    w = np.asarray(losses.overlap_l2_weights((4, 4), 0, 0.5))
    np.testing.assert_allclose(w, 0.5)


def test_gdl_zero_for_identical_and_shifted_invariance():
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(1, 8, 8, 3).astype(np.float32))
    assert float(losses.gdl(x, x)) == 0.0
    # adding a constant doesn't change gradients
    assert float(losses.gdl(x + 1.0, x)) < 1e-6


def test_gdl_penalizes_smoothing():
    rs = np.random.RandomState(5)
    target = jnp.asarray(rs.randn(1, 16, 16, 3).astype(np.float32))
    flat = jnp.zeros_like(target)  # no gradients at all
    assert float(losses.gdl(flat, target)) > 0.1


def test_gdl_matches_manual():
    rs = np.random.RandomState(6)
    p = rs.randn(2, 5, 5, 3).astype(np.float32)
    t = rs.randn(2, 5, 5, 3).astype(np.float32)
    ours = float(losses.gdl(jnp.asarray(p), jnp.asarray(t)))
    gh = np.mean(np.abs(np.abs(np.diff(t, axis=1)) - np.abs(np.diff(p, axis=1))))
    gw = np.mean(np.abs(np.abs(np.diff(t, axis=2)) - np.abs(np.diff(p, axis=2))))
    np.testing.assert_allclose(ours, gh + gw, rtol=1e-5)


def test_psnr():
    x = jnp.zeros((1, 4, 4, 3))
    assert float(losses.psnr(x, x)) > 100
    y = jnp.ones((1, 4, 4, 3)) * 2.0
    np.testing.assert_allclose(float(losses.psnr(x, y)), 0.0, atol=1e-4)


def test_ssim_properties_and_reference_formula():
    """SSIM: 1 on identical images, ordered by corruption level, and equal to
    an independent numpy implementation of the Wang-2004 formula."""
    import pytest

    from video_filler_tpu.ops.losses import ssim

    rs = np.random.RandomState(0)
    x = rs.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    xj = jnp.asarray(x)
    assert float(ssim(xj, xj)) == pytest.approx(1.0, abs=1e-5)
    small = float(ssim(jnp.asarray(x + 0.05 * rs.randn(*x.shape)
                                   .astype(np.float32)), xj))
    big = float(ssim(jnp.asarray(x + 0.3 * rs.randn(*x.shape)
                                 .astype(np.float32)), xj))
    assert 1.0 > small > big

    # independent numpy reference (valid-window gaussian SSIM)
    def np_ssim(a, b, L=2.0):
        r = np.arange(11) - 5.0
        g = np.exp(-0.5 * (r / 1.5) ** 2)
        g /= g.sum()
        w = np.outer(g, g)
        c1, c2 = (0.01 * L) ** 2, (0.03 * L) ** 2
        vals = []
        for n in range(a.shape[0]):
            for ch in range(a.shape[-1]):
                A, B = a[n, :, :, ch], b[n, :, :, ch]
                def blur(t):
                    out = np.zeros((t.shape[0] - 10, t.shape[1] - 10))
                    for i in range(out.shape[0]):
                        for j in range(out.shape[1]):
                            out[i, j] = (t[i:i + 11, j:j + 11] * w).sum()
                    return out
                mA, mB = blur(A), blur(B)
                sA = blur(A * A) - mA * mA
                sB = blur(B * B) - mB * mB
                sAB = blur(A * B) - mA * mB
                vals.append(((2 * mA * mB + c1) * (2 * sAB + c2)
                             / ((mA * mA + mB * mB + c1) * (sA + sB + c2))))
        return np.mean(vals)

    y = x + 0.1 * rs.randn(*x.shape).astype(np.float32)
    ours = float(ssim(jnp.asarray(y), xj))
    ref = np_ssim(y.astype(np.float64), x.astype(np.float64))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
