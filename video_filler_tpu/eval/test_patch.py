"""Patch / near-full-image eval (test.lua:72-130): sample a batch through the
data pipeline, center-mask, forward, paste back, save grids.  The two
reference modes are selected by loadSize (350 → random-crop patch eval,
129 → near-full-image) — here just loadSize flowing through the sampler."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from video_filler_tpu.config import Opt, from_args
from video_filler_tpu.data.index import FolderIndex
from video_filler_tpu.data.pipeline import center_sampler
from video_filler_tpu.eval.common import gen_input, load_generator
from video_filler_tpu.ops import masks
from video_filler_tpu.ops.image import normalize_uint8
from video_filler_tpu.utils import save_image_grid


def run_test(opt: Opt, out_prefix: str | None = None) -> dict[str, np.ndarray]:
    rs = np.random.RandomState(opt.manualSeed or None)
    index = FolderIndex(opt.DATA_ROOT)
    batch = center_sampler(opt, index)(rs)
    real = normalize_uint8(jnp.asarray(batch["raw"]))
    ctx = masks.center_mask_fill(real, opt.overlapPred)

    forward, params, bn_state = load_generator(opt, "center", opt.net)
    pred = forward(params, bn_state, gen_input(
        opt, ctx, jax.random.PRNGKey(opt.manualSeed)))
    inpainted = masks.paste_center(ctx, pred, opt.overlapPred)

    prefix = out_prefix or opt.name
    save_image_grid(f"{prefix}_real.png", np.asarray(real))
    save_image_grid(f"{prefix}_ctx.png", np.asarray(ctx))
    save_image_grid(f"{prefix}_inpainted.png", np.asarray(inpainted))
    return {"real": np.asarray(real), "ctx": np.asarray(ctx),
            "inpainted": np.asarray(inpainted)}


if __name__ == "__main__":
    run_test(from_args(sys.argv[1:]))
