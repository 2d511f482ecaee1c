"""Render gallery artifacts for the two regimes the round-3 gallery lacked:
logo (masked-pair model) and wholeim (27-channel patch-array model), from
the round-3 on-chip ledger checkpoints in /tmp/lw_ledgers.  CPU render of
the same code paths (conv semantics pinned CPU-vs-TPU by tests).

wholeim renders through the PRODUCTION SERVING PATH (serve.py full-frame
composite mode, frameH/frameW) on a held-out tail frame.
"""
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

from video_filler_tpu.config import Opt  # noqa: E402
from video_filler_tpu.data.pipeline import make_sampler  # noqa: E402
from video_filler_tpu.eval.common import load_generator  # noqa: E402
from video_filler_tpu.ops import masks  # noqa: E402
from video_filler_tpu.serve import InpaintServer  # noqa: E402
from video_filler_tpu.train.step import make_preprocess  # noqa: E402
from video_filler_tpu.utils.io import save_image_grid, save_png  # noqa: E402

OUT = os.path.join(_REPO, "assets", "gallery")
WORK = "/tmp/lw_ledgers"  # the ledger run's workdir (run_logo_wholeim_ledgers)
os.chdir(WORK)

# ---- logo: masked input grid vs mask-composite output grid ---------------
opt = Opt(DATA_ROOT="pairs/masked", DATA_ROOT_GT="pairs/gt_pairs",
          batchSize=8, loadSize=150, fineSize=128, nBottleneck=4000,
          manualSeed=222, display=False, computeDtype="float32",
          net="checkpoints/lw_lg_final_999_state.npz")
sampler, _ = make_sampler(opt, "logo", split="train")
preprocess = make_preprocess(opt, "logo")
forward, params, bn = load_generator(opt, "logo", opt.net)
rs = np.random.RandomState(222)
batch = preprocess(jax.tree.map(jnp.asarray, sampler(rs)),
                   jax.random.PRNGKey(222))
ctx, target, mask = batch["masked"], batch["real"], batch.get("mask")
pred = forward(params, bn, ctx)
comp = masks.fill_in(target, mask, pred) if mask is not None else pred
save_image_grid(f"{OUT}/logo_masked.png", np.asarray(ctx), n_cols=4)
save_image_grid(f"{OUT}/logo_inpaint.png",
                np.asarray(comp, np.float32), n_cols=4)
print("logo grids written", flush=True)

# ---- wholeim: full-frame composite through serve.py ----------------------
# Held-out tail frame (split=80 reserves the last 20% of each video's
# frames): the ledger corpus has 4 videos x 64 frames at 180x240.
from video_filler_tpu.data.index import VideoCorpus  # noqa: E402

corpus = VideoCorpus("corpus", split=80)
vid = 0
last = corpus.starts[vid] + corpus.counts[vid] - 1  # deep in the test tail
frame_path = corpus.get_clip(vid, last, 1)[0]
frame = np.asarray(Image.open(frame_path).convert("RGB"), np.uint8)
assert frame.shape == (180, 240, 3), frame.shape
mask = (np.asarray(Image.open("mask.png").convert("L")) > 128)
mask = mask.astype(np.uint8)[..., None]

wopt = Opt(nef=192, ngf=192, ndf=128, nBottleneck=6400, frameH=180,
           frameW=240, batchSize=1, computeDtype="float32", display=False)
srv = InpaintServer(wopt, "wholeim", "checkpoints/lw_wi_final_999_state.npz",
                    port=0, max_delay_ms=1.0)
try:
    out = srv.infer(frame[None], mask[None])[0]
finally:
    srv.close()
save_png(f"{OUT}/wholeim_serve_orig.png", frame)
masked_vis = frame.copy()
fill = int(round(wopt.maskValue * 255.0))
masked_vis[mask[..., 0] > 0] = fill
save_png(f"{OUT}/wholeim_serve_masked.png", masked_vis)
save_png(f"{OUT}/wholeim_serve_inpaint.png", out)
print("wholeim serve frames written", flush=True)
print("frame:", frame_path)
