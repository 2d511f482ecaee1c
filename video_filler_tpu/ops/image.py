"""On-device image preprocessing — the TPU-native replacement for the Torch
`image` C library calls in the donkeys (resize/crop/hflip/normalize,
data/donkey_folder.lua:39-86).

Design: the host pipeline decodes and aspect-resizes (variable shapes stay on
the host, see data/decode.py); everything with a static shape — random crop,
horizontal flip, [0,1]→[-1,1] normalization, mask synthesis — runs here as jnp
functions that fuse into the train-step jit.  Batches cross PCIe as uint8
(4x less host→HBM traffic than f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_uint8(x: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 [0,255] → float [-1,1] (donkey `mul(2):add(-1)` after [0,1] load)."""
    return x.astype(dtype) * (2.0 / 255.0) - 1.0


def denormalize_to_uint8(x: jax.Array) -> jax.Array:
    """float [-1,1] → uint8 [0,255] for PNG/GIF output."""
    y = jnp.clip((x + 1.0) * (255.0 / 2.0), 0.0, 255.0)
    return jnp.round(y).astype(jnp.uint8)


def random_crop(key: jax.Array, images: jax.Array, crop: int) -> jax.Array:
    """Per-sample random spatial crop (donkey_folder.lua:77-81).

    images: (B, H, W, C) with H,W >= crop.  Offsets uniform over
    0..H-crop-1 — the Lua range (`math.ceil(torch.uniform(1e-2, iH-oH))` is
    1-based 1..iH-oH, so the extreme offset never occurs; same convention as
    the host/native crop paths).  Per-sample dynamic_slice under vmap —
    static output shape.
    """
    b, h, w, c = images.shape
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (b,), 0, max(h - crop, 1))
    x0 = jax.random.randint(kx, (b,), 0, max(w - crop, 1))

    def one(img, y, x):
        return jax.lax.dynamic_slice(img, (y, x, 0), (crop, crop, c))

    return jax.vmap(one)(images, y0, x0)


def random_hflip(key: jax.Array, images: jax.Array, prob: float = 0.5,
                 *companions: jax.Array):
    """Per-sample horizontal flip with probability `prob`, applied identically
    to any companion arrays (gt/masked/mask flipped together,
    datavid/donkey_folder.lua:174-180).  Flip axis = W (axis 2, NHWC)."""
    b = images.shape[0]
    flip = jax.random.uniform(key, (b,)) < prob

    def _apply(x):
        sel = flip.reshape((b,) + (1,) * (x.ndim - 1))
        return jnp.where(sel, jnp.flip(x, axis=2), x)

    out = tuple(_apply(x) for x in (images, *companions))
    return out[0] if not companions else out


def vflip(images: jax.Array) -> jax.Array:
    """Vertical flip (H axis) — the tiled eval's top-row trick
    (test_vid_wholeim.lua:167-171)."""
    return jnp.flip(images, axis=1)


def resize_bilinear(images: jax.Array, height: int, width: int) -> jax.Array:
    """Bilinear resize on device (image.scale equivalent for fixed shapes)."""
    b, _, _, c = images.shape
    return jax.image.resize(images, (b, height, width, c), method="bilinear")
