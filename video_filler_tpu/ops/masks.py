"""Mask synthesis and compositing — pure jnp functions of static shapes.

The reference synthesizes masks imperatively across donkeys and trainers:
* center hole with per-channel ImageNet-mean fill and an overlapPred context
  ring (train.lua:287-290),
* logo masks loaded from mask*.png and binarized (datavid/donkey_folder.lua:33-35
  truncates via :byte(); test_vid_wholeim.lua:111 uses :gt(0.3) — two DIFFERENT
  binarizations, both provided here),
* random block masks as fallback when the cropped logo mask is empty
  (datavid/donkey_folder.lua:114-129,165-169),
* masked_fill / fill_in compositing (inpaint_utils.lua:30-101) via
  data-dependent maskedSelect/maskedCopy — replaced by fixed-shape jnp.where.

Everything here is jit-safe (static shapes, no data-dependent control flow) so
mask synthesis fuses into the train step on device.  Layout NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# train.lua:288-290 — ImageNet per-channel means, normalized to [-1,1].
CENTER_FILL_RGB = tuple(2.0 * m / 255.0 - 1.0 for m in (117.0, 104.0, 123.0))


def center_region(fine_size: int) -> tuple[int, int]:
    """[start, stop) rows/cols of the fineSize/2 center (train.lua:287)."""
    return fine_size // 4, fine_size // 4 + fine_size // 2


def extract_center(images: jax.Array) -> jax.Array:
    """real_center = the central fineSize/2 square (train.lua:287)."""
    lo, hi = center_region(images.shape[1])
    return images[:, lo:hi, lo:hi, :]


def center_mask_fill(images: jax.Array, overlap_pred: int = 0,
                     fill=CENTER_FILL_RGB) -> jax.Array:
    """Fill the center hole (minus an overlapPred-wide context ring) with the
    per-channel means (train.lua:288-290).  images: (B,H,W,C) in [-1,1]; C may
    be nc*predLen — fill repeats per frame."""
    fs = images.shape[1]
    lo, hi = center_region(fs)
    lo, hi = lo + overlap_pred, hi - overlap_pred
    c = images.shape[-1]
    fill_vec = jnp.asarray(np.resize(np.asarray(fill, np.float32), c),
                           dtype=images.dtype)
    region = jnp.broadcast_to(fill_vec, (images.shape[0], hi - lo, hi - lo, c))
    return images.at[:, lo:hi, lo:hi, :].set(region)


def paste_center(ctx: jax.Array, pred_center: jax.Array,
                 overlap_pred: int = 0) -> jax.Array:
    """Paste the predicted center back into the context image, keeping the
    overlapPred ring from the context (train.lua:441, demo.lua:73-76)."""
    fs = ctx.shape[1]
    lo, hi = center_region(fs)
    lo, hi = lo + overlap_pred, hi - overlap_pred
    op = overlap_pred
    inner = pred_center[:, op:pred_center.shape[1] - op,
                        op:pred_center.shape[2] - op, :]
    return ctx.at[:, lo:hi, lo:hi, :].set(inner.astype(ctx.dtype))


def binarize_mask(mask01: np.ndarray, mode: str = "byte") -> np.ndarray:
    """Binarize a [0,1] float mask image.

    mode='byte':  Torch `image.load(...):byte()` truncates toward zero, so only
                  exactly-1.0 (uint8 255) pixels survive
                  (datavid/donkey_folder.lua:33-35).
    mode='gt03':  `:gt(0.3)` threshold used by the tiled eval
                  (test_vid_wholeim.lua:111,121).
    """
    if mode == "byte":
        return (mask01 >= 1.0).astype(np.uint8)
    if mode == "gt03":
        return (mask01 > 0.3).astype(np.uint8)
    raise ValueError(f"unknown binarize mode {mode!r}")


def masked_fill(images: jax.Array, mask: jax.Array, value: float) -> jax.Array:
    """maskedFill: set masked pixels to `value` (inpaint_utils.lua:30-60).
    mask broadcasts against images (bool or {0,1})."""
    return jnp.where(mask.astype(bool), jnp.asarray(value, images.dtype), images)


def fill_in(dst: jax.Array, mask: jax.Array, src: jax.Array) -> jax.Array:
    """fillIn: copy src's masked pixels into dst (inpaint_utils.lua:63-101).
    Fixed-shape jnp.where replaces maskedSelect/maskedCopy."""
    return jnp.where(mask.astype(bool), src, dst)


def random_block_mask(key: jax.Array, batch: int, height: int, width: int,
                      max_blocks: int = 10, min_blocks: int = 2) -> jax.Array:
    """Random square-block masks (datavid/donkey_folder.lua:114-129).

    Per sample: nBlocks ~ U{min..max} blocks of side floor(h/6), top-left
    uniform in the Lua range [3, dim-blockSize-2] (1-based) == [2, dim-bs-3]
    0-based inclusive.  Returns (B, H, W, 1) float {0,1}.

    TPU-native: always generates max_blocks rectangles and masks out the
    surplus with a validity predicate — static shapes, no host round-trip.
    """
    bs = height // 6
    k_n, k_y, k_x = jax.random.split(key, 3)
    n_blocks = jax.random.randint(k_n, (batch,), min_blocks, max_blocks + 1)
    tly = jax.random.randint(k_y, (batch, max_blocks), 2, height - bs - 2)
    tlx = jax.random.randint(k_x, (batch, max_blocks), 2, width - bs - 2)
    rows = jnp.arange(height)[None, None, :, None]   # (1,1,H,1)
    cols = jnp.arange(width)[None, None, None, :]    # (1,1,1,W)
    in_y = (rows >= tly[:, :, None, None]) & (rows < (tly + bs)[:, :, None, None])
    in_x = (cols >= tlx[:, :, None, None]) & (cols < (tlx + bs)[:, :, None, None])
    valid = (jnp.arange(max_blocks)[None, :] < n_blocks[:, None])[:, :, None, None]
    blocks = in_y & in_x & valid                     # (B, max_blocks, H, W)
    return jnp.any(blocks, axis=1)[..., None].astype(jnp.float32)


def mask_or_random_block(key: jax.Array, cropped_mask: jax.Array) -> jax.Array:
    """Per-sample fallback: if a sample's cropped logo mask is empty, substitute
    a random block mask (datavid/donkey_folder.lua:165-169).

    cropped_mask: (B, H, W, 1) in {0,1}.  Branch-free: both masks are cheap, a
    per-sample where picks one (maskout:max() > 0.5 test in the reference).
    """
    b, h, w, _ = cropped_mask.shape
    rand = random_block_mask(key, b, h, w)
    has_mask = jnp.max(cropped_mask, axis=(1, 2, 3), keepdims=True) > 0.5
    return jnp.where(has_mask, cropped_mask, rand)


def apply_logo_mask(images: jax.Array, mask: jax.Array,
                    mask_value: float) -> jax.Array:
    """masked = maskedFill(gt, mask, maskValue) then [0,1]→[-1,1]
    (datavid/donkey_folder.lua:161-186).  Operating on already-normalized
    images, the fill value becomes 2*maskValue-1."""
    return masked_fill(images, mask, 2.0 * mask_value - 1.0)
