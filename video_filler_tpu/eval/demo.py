"""Center-inpainting demo (demo.lua:49-97): read images from a folder, scale
to 128², mean-fill the center hole, run G, paste the predicted center back
(respecting overlapPred), save a side-by-side grid PNG."""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from video_filler_tpu.config import Opt, from_args
from video_filler_tpu.data import decode
from video_filler_tpu.data.index import IMG_EXTS
from video_filler_tpu.eval.common import gen_input, load_generator
from video_filler_tpu.ops import masks
from video_filler_tpu.ops.image import normalize_uint8
from video_filler_tpu.utils import save_image_grid


def run_demo(opt: Opt, out_path: str | None = None) -> dict[str, np.ndarray]:
    """Returns the arrays too (ctx, pred_center, inpainted) for testing."""
    files = sorted(f for f in os.listdir(opt.imDir)
                   if f.lower().endswith(IMG_EXTS))[: opt.batchSize]
    if not files:
        raise FileNotFoundError(f"no images in {opt.imDir}")
    imgs = np.stack([decode.resize(
        decode.decode_image(os.path.join(opt.imDir, f), opt.nc), 128, 128)
        for f in files])
    real = normalize_uint8(jnp.asarray(imgs))
    ctx = masks.center_mask_fill(real, opt.overlapPred)

    forward, params, bn_state = load_generator(opt, "center", opt.net)
    pred_center = forward(params, bn_state, gen_input(
        opt, ctx, jax.random.PRNGKey(opt.manualSeed)))
    inpainted = masks.paste_center(ctx, pred_center, opt.overlapPred)

    if out_path is None:
        out_path = f"{opt.name}.png"
    # side-by-side: masked context | inpainted result (demo.lua:92-97)
    pairs = np.concatenate([np.asarray(ctx), np.asarray(inpainted)], axis=2)
    save_image_grid(out_path, pairs, n_cols=1)
    return {"ctx": np.asarray(ctx), "pred_center": np.asarray(pred_center),
            "inpainted": np.asarray(inpainted)}


if __name__ == "__main__":
    run_demo(from_args(sys.argv[1:]))
