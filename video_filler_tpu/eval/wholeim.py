"""Tiled full-frame video inference — the flagship demo
(test_vid_wholeim.lua:115-257, and test_more_complex.lua without the
initializer).

Pipeline, matching the reference step for step:
1. Load predLen consecutive frames, scale to (loadSize, loadSize*W/H),
   mask-fill with the gt(0.3)-binarized scaled mask, normalize, zero-pad
   bottom-right to multiples of fineSize (pad value -1 after normalize:
   the reference normalizes AFTER writing into a zero canvas,
   test_vid_wholeim.lua:139-141).
2. Slide fineSize² windows; frames are grouped inputLen-per-sample so the
   net (trained on nc*inputLen channels) processes predLen/inputLen samples
   per tile.  The THREE leftmost top-row tiles are vertically flipped before
   the net and un-flipped after — the mask sits in the top corner and
   training crops rarely covered it; flipping moves it into familiar
   territory (test_vid_wholeim.lua:167-171,194-200).
3. Optional initializer cascade: netI's output composited into the masked
   pixels before G (test_vid_wholeim.lua:178-190).
4. The prediction is composited into the original frames ONLY inside the
   (padded) mask; everything is denormalized and written as
   pred_/inpaint_/orig_*.png + three GIFs (test_vid_wholeim.lua:207-257).

TPU-native formulation: all tiles are gathered into ONE batch
(tiles x time-groups) and the generator runs a single batched forward per
frame-group — no per-tile Python loop on the hot path.
"""

from __future__ import annotations

import os
import sys

import jax.numpy as jnp
import numpy as np

from video_filler_tpu.config import Opt, from_args
from video_filler_tpu.data import decode
from video_filler_tpu.data.index import VideoCorpus
from video_filler_tpu.eval.common import load_generator
from video_filler_tpu.eval.tiling import (frame_geometry, gather_tiles,
                                          scatter_tiles)
from video_filler_tpu.ops import masks
from video_filler_tpu.utils import save_gif, save_png


def _load_padded_frames(opt: Opt, corpus: VideoCorpus,
                        rs: np.random.RandomState,
                        mask01: np.ndarray):
    """Returns (frames, orig, padmask): frames (T, outH, outW, nc) in [-1,1]
    mask-filled + padded; orig the unpadded [-1,1] mask-filled originals;
    padmask (outH, outW, 1) uint8."""
    vid = rs.randint(len(corpus.suffixes))
    start = corpus.starts[vid] + rs.randint(corpus.counts[vid]
                                            - opt.predLen + 1)
    paths = corpus.get_clip(vid, start, opt.predLen)

    # geometry from the video actually sampled (mixed-resolution corpora)
    sc_mask, padmask, (inh, inw, outh, outw) = frame_geometry(
        opt, corpus, vid, mask01)

    frames = np.zeros((opt.predLen, outh, outw, opt.nc), np.float32)
    orig = np.zeros((opt.predLen, inh, inw, opt.nc), np.float32)
    for t, p in enumerate(paths):
        im = decode.resize(decode.decode_image(p, opt.nc), inh, inw)
        im01 = im.astype(np.float32) / 255.0
        filled = np.where(sc_mask > 0, np.float32(opt.maskValue), im01)
        orig[t] = filled * 2.0 - 1.0
        frames[t, :inh, :inw] = filled
    frames = frames * 2.0 - 1.0  # pad region becomes -1 (reference semantics)
    return frames, orig, padmask, (inh, inw, outh, outw)


def run_wholeim(opt: Opt, out_dir: str | None = None,
                with_init: bool | None = None) -> dict[str, np.ndarray]:
    if opt.noiseGen:
        raise ValueError("noiseGen does not compose with tiled whole-frame "
                         "eval (same guard as serve.py's frame mode)")
    input_len = opt.inputLen or opt.predLen
    assert opt.predLen % input_len == 0, \
        "predLen must divide by inputLen (test_vid_wholeim.lua:41)"
    groups = opt.predLen // input_len

    rs = np.random.RandomState(opt.manualSeed or None)
    corpus = VideoCorpus(opt.DATA_ROOT,
                         variants=(("gt", 1.0 - opt.gt1Prob),
                                   ("gt1", opt.gt1Prob)))
    mask01 = decode.decode_image(opt.maskName, nc=1).astype(np.float32) / 255.0
    frames, orig, padmask, (inh, inw, outh, outw) = _load_padded_frames(
        opt, corpus, rs, mask01)
    fs = opt.fineSize
    n_th, n_tw = outh // fs, outw // fs

    # Gather every tile for every time-group into one batch:
    # (groups * n_th * n_tw, fs, fs, nc*input_len)
    folded = frames.reshape(groups, input_len, outh, outw, opt.nc)
    folded = folded.transpose(0, 2, 3, 1, 4).reshape(groups, outh, outw,
                                                     input_len * opt.nc)
    tiles = []
    for g in range(groups):
        tiles += gather_tiles(folded[g], fs)  # vflip trick inside
    batch = jnp.asarray(np.stack(tiles))

    eval_opt = opt.replace(predLen=input_len)
    forward, params, bn_state = load_generator(eval_opt, "video", opt.net)
    use_init = with_init if with_init is not None else bool(opt.initName)
    if use_init:
        fwd_i, params_i, bn_i = load_generator(eval_opt, "video", opt.initName)
        mid_mask = jnp.asarray(padmask)
        tile_masks = []
        for g in range(groups):
            tile_masks += gather_tiles(mid_mask, fs)
        tm = jnp.stack(tile_masks)
        mid = fwd_i(params_i, bn_i, batch)
        batch = masks.fill_in(batch, tm, mid)
    out = np.asarray(forward(params, bn_state, batch))

    # Scatter back (un-vflip the trick tiles)
    n_tiles = n_th * n_tw
    pred = np.stack([scatter_tiles(out[g * n_tiles:(g + 1) * n_tiles],
                                   fs, outh, outw) for g in range(groups)])
    pred_frames = pred.reshape(groups, outh, outw, input_len, opt.nc)
    pred_frames = pred_frames.transpose(0, 3, 1, 2, 4).reshape(
        opt.predLen, outh, outw, opt.nc)

    # Composite only inside the mask (test_vid_wholeim.lua:207-220)
    inpaint = np.where(padmask[None] > 0, pred_frames, frames)

    out_dir = out_dir or (f"{opt.name}_prl{opt.predLen}_inl{input_len}"
                          f"_ldsz{opt.loadSize}")
    os.makedirs(out_dir, exist_ok=True)
    for t in range(opt.predLen):
        save_png(f"{out_dir}/pred_{t + 1}.png", pred_frames[t])
        save_png(f"{out_dir}/inpaint_{t + 1}.png", inpaint[t])
        # pad-cropped composite at the original frame size — the reference
        # saves only the padded canvas (black bottom/right bands,
        # test_vid_wholeim.lua:207-237); the crop is the same pixels minus
        # the padding, directly comparable with orig_*
        save_png(f"{out_dir}/inpaint_crop_{t + 1}.png", inpaint[t, :inh, :inw])
        # orig_* are the UNPADDED mask-filled inputs (no -1 pad bands)
        save_png(f"{out_dir}/orig_{t + 1}.png", orig[t])
    save_gif(f"{out_dir}_result.gif", pred_frames)
    save_gif(f"{out_dir}_inpaint.gif", inpaint[:, :inh, :inw])
    save_gif(f"{out_dir}_orig.gif", orig)
    return {"pred": pred_frames, "inpaint": inpaint, "input": frames,
            "orig": orig, "padmask": padmask}


if __name__ == "__main__":
    run_wholeim(from_args(sys.argv[1:]))
