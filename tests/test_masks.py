"""Mask synthesis / compositing semantics (train.lua:287-290,
datavid/donkey_folder.lua:114-186, inpaint_utils.lua)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_filler_tpu.ops import masks


def test_center_region_indices():
    # Lua 1-based [1+fs/4, fs/2+fs/4] == 0-based [fs/4, fs/4+fs/2)
    assert masks.center_region(128) == (32, 96)


def test_center_mask_fill_values():
    x = jnp.zeros((1, 128, 128, 3))
    y = masks.center_mask_fill(x, overlap_pred=0)
    got = np.asarray(y[0, 64, 64])
    np.testing.assert_allclose(
        got, [2 * 117 / 255 - 1, 2 * 104 / 255 - 1, 2 * 123 / 255 - 1],
        rtol=1e-5)
    # outside the hole untouched
    assert float(y[0, 0, 0, 0]) == 0.0
    assert float(y[0, 31, 64, 0]) == 0.0
    assert float(y[0, 32, 32, 0]) != 0.0


def test_center_mask_fill_overlap_ring_kept():
    """overlapPred leaves a ring of real context inside the hole (train.lua:288)."""
    x = jnp.zeros((1, 128, 128, 3))
    y = masks.center_mask_fill(x, overlap_pred=4)
    assert float(y[0, 33, 64, 0]) == 0.0     # inside ring: untouched
    assert float(y[0, 36, 64, 0]) != 0.0     # past the ring: filled
    assert float(y[0, 93, 64, 0]) == 0.0     # bottom ring


def test_center_fill_multi_frame_channels():
    """Video channel-folding repeats the RGB fill per frame."""
    x = jnp.zeros((1, 128, 128, 6))
    y = masks.center_mask_fill(x, 0)
    got = np.asarray(y[0, 64, 64])
    np.testing.assert_allclose(got[:3], got[3:], rtol=1e-6)


def test_extract_and_paste_center_roundtrip():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 128, 128, 3).astype(np.float32))
    center = masks.extract_center(x)
    assert center.shape == (2, 64, 64, 3)
    pasted = masks.paste_center(jnp.zeros_like(x), center, overlap_pred=0)
    np.testing.assert_allclose(np.asarray(masks.extract_center(pasted)),
                               np.asarray(center))


def test_paste_center_respects_overlap():
    x = jnp.zeros((1, 128, 128, 3))
    center = jnp.ones((1, 64, 64, 3))
    pasted = masks.paste_center(x, center, overlap_pred=4)
    assert float(pasted[0, 33, 64, 0]) == 0.0   # ring region from ctx
    assert float(pasted[0, 36, 64, 0]) == 1.0


def test_binarize_byte_vs_gt03():
    """Two different reference binarizations (donkey :byte() vs eval :gt(0.3))."""
    m = np.asarray([0.0, 0.2, 0.5, 0.99, 1.0], np.float32)
    np.testing.assert_array_equal(masks.binarize_mask(m, "byte"),
                                  [0, 0, 0, 0, 1])
    np.testing.assert_array_equal(masks.binarize_mask(m, "gt03"),
                                  [0, 0, 1, 1, 1])


def test_masked_fill_and_fill_in():
    dst = jnp.zeros((1, 4, 4, 2))
    src = jnp.ones((1, 4, 4, 2))
    mask = jnp.zeros((1, 4, 4, 1)).at[0, 1, 1, 0].set(1.0)
    filled = masks.masked_fill(dst, mask, 0.5)
    assert float(filled[0, 1, 1, 0]) == 0.5 and float(filled[0, 0, 0, 0]) == 0.0
    merged = masks.fill_in(dst, mask, src)
    assert float(merged[0, 1, 1, 1]) == 1.0 and float(merged[0, 2, 2, 0]) == 0.0


def test_random_block_mask_properties(rng):
    h = w = 120
    m = masks.random_block_mask(rng, batch=8, height=h, width=w)
    assert m.shape == (8, h, w, 1)
    m_np = np.asarray(m)
    assert set(np.unique(m_np)) <= {0.0, 1.0}
    frac = m_np.mean(axis=(1, 2, 3))
    bs = h // 6
    assert (frac > 0).all()
    # each sample has at least 1 block's worth (overlaps allowed) and bounded
    assert (frac * h * w >= bs * bs - 1).all()
    assert (frac * h * w <= 10 * bs * bs).all()
    # blocks keep away from ALL borders (Lua [3, dim-bs-2] 1-based): start
    # in [2, dim-bs-3] 0-based, so both the first AND last 2 rows/cols stay
    # clear — an off-by-one on the upper bound would touch bottom/right.
    assert m_np[:, :2, :, :].sum() == 0 and m_np[:, :, :2, :].sum() == 0
    assert m_np[:, -2:, :, :].sum() == 0 and m_np[:, :, -2:, :].sum() == 0


def test_mask_or_random_block_fallback(rng):
    empty = jnp.zeros((2, 60, 60, 1))
    logo = jnp.zeros((2, 60, 60, 1)).at[:, 5:10, 5:10, :].set(1.0)
    out_logo = masks.mask_or_random_block(rng, logo)
    np.testing.assert_allclose(np.asarray(out_logo), np.asarray(logo))
    out_rand = masks.mask_or_random_block(rng, empty)
    assert float(out_rand.sum()) > 0  # substituted random blocks


def test_apply_logo_mask_value():
    """maskValue fills in [0,1] space then normalizes: fill == 2*v-1."""
    x = jnp.zeros((1, 8, 8, 3))
    mask = jnp.ones((1, 8, 8, 1))
    y = masks.apply_logo_mask(x, mask, 110.0 / 255.0)
    np.testing.assert_allclose(np.asarray(y), 2 * 110.0 / 255.0 - 1.0, rtol=1e-5)
