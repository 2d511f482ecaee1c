"""Video clip eval (test_vid.lua:81-147): sample one masked clip batch, run G,
write per-frame PNGs and an animated GIF (in-process writer replaces the
reference's ImageMagick `convert` subprocess, test_vid.lua:145-147)."""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from video_filler_tpu.config import Opt, from_args
from video_filler_tpu.data.index import VideoCorpus
from video_filler_tpu.data.pipeline import load_mask, video_sampler
from video_filler_tpu.eval.common import gen_input, load_generator
from video_filler_tpu.ops import masks
from video_filler_tpu.train.step import make_preprocess
from video_filler_tpu.utils import save_gif, save_png


def _unfold(clip: np.ndarray, nc: int) -> np.ndarray:
    """Frames as (N, H, W, nc): channel-folded (B,H,W,nc*T) or temporal
    (B,T,H,W,nc) clips both flatten to a frame sequence."""
    if clip.ndim == 5:
        b, t, h, w, c = clip.shape
        return clip.reshape(b * t, h, w, c)
    b, h, w, c = clip.shape
    pl = c // nc
    return clip.reshape(b, h, w, pl, nc).transpose(0, 3, 1, 2,
                                                   4).reshape(-1, h, w, nc)


def run_test_vid(opt: Opt, out_dir: str | None = None,
                 regime: str = "video") -> dict[str, np.ndarray]:
    """Works for both the channel-folded 2D regime and the temporal 3D one."""
    rs = np.random.RandomState(opt.manualSeed or None)
    corpus = VideoCorpus(opt.DATA_ROOT,
                         variants=(("gt", 1.0 - opt.gt1Prob),
                                   ("gt1", opt.gt1Prob)))
    mask = load_mask(opt.maskName) if opt.maskName else None
    host_batch = video_sampler(opt, corpus, mask)(rs)
    batch = make_preprocess(opt, regime)(
        jax.tree.map(jnp.asarray, host_batch),
        jax.random.PRNGKey(opt.manualSeed))

    forward, params, bn_state = load_generator(opt, regime, opt.net)
    ctx = masks.apply_logo_mask(batch["real"], batch["mask"], opt.maskValue)
    fake = forward(params, bn_state, gen_input(
        opt, ctx, jax.random.PRNGKey(opt.manualSeed)))
    inpainted = masks.fill_in(batch["real"], batch["mask"], fake)

    out_dir = out_dir or opt.name
    os.makedirs(out_dir, exist_ok=True)
    frames_fake = _unfold(np.asarray(fake), opt.nc)
    frames_ctx = _unfold(np.asarray(ctx), opt.nc)
    frames_inp = _unfold(np.asarray(inpainted), opt.nc)
    for i, (f, c, n) in enumerate(zip(frames_fake, frames_ctx, frames_inp)):
        save_png(f"{out_dir}/pred_{i + 1}.png", f)
        save_png(f"{out_dir}/masked_{i + 1}.png", c)
        save_png(f"{out_dir}/inpaint_{i + 1}.png", n)
    save_gif(f"{out_dir}_result.gif", frames_fake)
    save_gif(f"{out_dir}_inpaint.gif", frames_inp)
    return {"fake": frames_fake, "ctx": frames_ctx, "inpainted": frames_inp}


if __name__ == "__main__":
    from video_filler_tpu.config import split_regime

    _regime, _rest = split_regime(sys.argv[1:], default="video")
    if _regime not in ("video", "video3d"):
        raise SystemExit(f"eval.video handles regime=video|video3d, "
                         f"got {_regime!r}")
    run_test_vid(from_args(_rest), regime=_regime)
