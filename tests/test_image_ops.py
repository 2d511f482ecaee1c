"""Direct unit tests for the on-device preprocess ops (ops/image.py) —
the TPU-side replacements for the donkeys' image-library calls."""

import jax
import jax.numpy as jnp
import numpy as np

from video_filler_tpu.ops import image as image_ops


def test_normalize_denormalize_roundtrip_exact():
    """Every uint8 value must survive normalize -> denormalize unchanged
    (the uint8 boundary used by serving/streaming depends on it)."""
    x = jnp.arange(256, dtype=jnp.uint8).reshape(1, 16, 16, 1)
    y = image_ops.normalize_uint8(x)
    assert float(y.min()) == -1.0 and float(y.max()) == 1.0
    back = image_ops.denormalize_to_uint8(y)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_random_crop_is_contiguous_window(rng):
    """Each output is an actual (crop x crop) subwindow of ITS input, offsets
    within the Lua-parity range 0..H-crop-1, per-sample independent."""
    b, h, w, crop = 8, 20, 24, 12
    base = np.arange(h * w).reshape(1, h, w, 1).astype(np.float32)
    imgs = jnp.asarray(np.concatenate([base + 1000 * i for i in range(b)]))
    out = np.asarray(image_ops.random_crop(rng, imgs, crop))
    assert out.shape == (b, crop, crop, 1)
    offsets = []
    for i in range(b):
        first = out[i, 0, 0, 0] - 1000 * i
        y0, x0 = int(first) // w, int(first) % w
        assert 0 <= y0 <= h - crop - 1 and 0 <= x0 <= w - crop - 1
        np.testing.assert_array_equal(
            out[i, :, :, 0],
            np.asarray(imgs)[i, y0:y0 + crop, x0:x0 + crop, 0])
        offsets.append((y0, x0))
    assert len(set(offsets)) > 1  # per-sample, not one shared offset


def test_random_hflip_companions_flip_together(rng):
    b = 64
    rs = np.random.RandomState(0)
    imgs = jnp.asarray(rs.rand(b, 4, 6, 3).astype(np.float32))
    mask = jnp.asarray(rs.rand(b, 4, 6, 1).astype(np.float32))
    out, mout = image_ops.random_hflip(rng, imgs, 0.5, mask)
    flipped = unflipped = 0
    for i in range(b):
        if np.array_equal(np.asarray(out)[i], np.asarray(imgs)[i, :, ::-1]):
            # companion must flip with it
            np.testing.assert_array_equal(np.asarray(mout)[i],
                                          np.asarray(mask)[i, :, ::-1])
            flipped += 1
        else:
            np.testing.assert_array_equal(np.asarray(out)[i],
                                          np.asarray(imgs)[i])
            np.testing.assert_array_equal(np.asarray(mout)[i],
                                          np.asarray(mask)[i])
            unflipped += 1
    assert flipped > 8 and unflipped > 8  # p=0.5 over 64 samples

    # deterministic under the same key; single-array form returns the array
    again = image_ops.random_hflip(rng, imgs, 0.5, mask)[0]
    np.testing.assert_array_equal(np.asarray(again), np.asarray(out))
    solo = image_ops.random_hflip(rng, imgs)
    np.testing.assert_array_equal(np.asarray(solo), np.asarray(out))


def test_vflip_and_resize_shapes(rng):
    rs = np.random.RandomState(1)
    imgs = jnp.asarray(rs.rand(2, 6, 4, 3).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(image_ops.vflip(imgs)),
                                  np.asarray(imgs)[:, ::-1])
    r = image_ops.resize_bilinear(imgs, 12, 8)
    assert r.shape == (2, 12, 8, 3)
