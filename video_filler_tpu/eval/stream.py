"""Streaming whole-video inpainting — serving-oriented batch processing.

The reference's flagship eval (test_vid_wholeim.lua) processes ONE random
predLen-frame window per invocation; cleaning a whole broadcast means
re-running it thousands of times.  This driver streams an entire video:
it walks the corpus in consecutive predLen windows, runs the tiled
inpainting pipeline (same semantics as eval/wholeim.py: gt(0.3) mask,
pad-to-tiles, vflip-top-tiles trick, composite-inside-mask) with decode
for window k+1 overlapped against TPU compute for window k, and writes
a continuous inpainted frame sequence + GIF.

CLI:
    python -m video_filler_tpu.eval.stream DATA_ROOT=... maskName=... \
        net=checkpoints/..._state.npz predLen=4 loadSize=240 \
        [video=0] [startFrame=1] [numFrames=64] [name=out]
"""

from __future__ import annotations

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from video_filler_tpu.config import Opt, from_args
from video_filler_tpu.data import decode
from video_filler_tpu.data.index import VideoCorpus
from video_filler_tpu.eval.common import load_generator
from video_filler_tpu.eval.tiling import (frame_geometry, gather_tiles,
                                          scatter_tiles)
from video_filler_tpu.utils import save_gif, save_png

GIF_MAX_FRAMES = 64


def _load_window(opt: Opt, paths, sc_mask, geom):
    """uint8 end-to-end on the host: normalization happens on device, so the
    host->device transfer is 4x smaller.  Pad value 0 == the reference's -1
    after normalization (zero canvas written before mul(2):add(-1))."""
    inh, inw, outh, outw = geom
    fill = np.uint8(round(opt.maskValue * 255.0))
    frames = np.zeros((len(paths), outh, outw, opt.nc), np.uint8)
    for t, p in enumerate(paths):
        im = decode.resize(decode.decode_image(p, opt.nc), inh, inw)
        frames[t, :inh, :inw] = np.where(sc_mask > 0, fill, im)
    return frames


def _tiles_of(frames: np.ndarray, fs: int, nc: int):
    """(T, outH, outW, nc) -> one (tiles, fs, fs, nc*T) batch (vflip trick)."""
    t, outh, outw, _ = frames.shape
    folded = frames.transpose(1, 2, 0, 3).reshape(outh, outw, t * nc)
    return np.stack(gather_tiles(folded, fs))


def _scatter(out: np.ndarray, fs: int, nc: int, t: int, outh: int, outw: int):
    pred = scatter_tiles(out, fs, outh, outw)
    return pred.reshape(outh, outw, t, nc).transpose(2, 0, 1, 3)


def run_stream(opt: Opt, video: int = 0, start_frame: int | None = None,
               num_frames: int | None = None, out_dir: str | None = None,
               write_gif: bool = True):
    if opt.noiseGen:
        raise ValueError("noiseGen does not compose with tiled whole-frame "
                         "eval (same guard as serve.py's frame mode)")
    corpus = VideoCorpus(opt.DATA_ROOT,
                         variants=(("gt", 1.0 - opt.gt1Prob),
                                   ("gt1", opt.gt1Prob)))
    mask01 = decode.decode_image(opt.maskName, nc=1).astype(np.float32) / 255.0
    sc_mask, padmask, geom = frame_geometry(opt, corpus, video, mask01)
    inh, inw, outh, outw = geom
    fs, nc, pl = opt.fineSize, opt.nc, opt.predLen

    # `is None` checks: frame numbering can legitimately start at 0
    # (VideoCorpus derives starts from min frame number), so startFrame=0
    # must not fall through to the corpus default.
    start = corpus.starts[video] if start_frame is None else start_frame
    total = (corpus.counts[video] - (start - corpus.starts[video])
             if num_frames is None else num_frames)
    total -= total % pl
    assert total > 0, "no full predLen window in the requested range"

    forward, params, bn_state = load_generator(opt, "video", opt.net)

    @jax.jit
    def tiled_forward(params, bn_state, tiles_u8):
        # params as ARGUMENTS, not closure constants — capturing them would
        # bake 260MB of weights into the serialized program.
        x = tiles_u8.astype(jnp.float32) * (2.0 / 255.0) - 1.0
        y = forward(params, bn_state, x)
        return jnp.round(jnp.clip((y + 1.0) * 127.5, 0, 255)).astype(jnp.uint8)

    params = jax.device_put(params)
    bn_state = jax.device_put(bn_state)

    out_dir = out_dir or f"{opt.name}_stream"
    pm = padmask[None] > 0

    windows = [corpus.get_clip(video, start + k, pl)
               for k in range(0, total, pl)]
    # Only the first GIF_MAX_FRAMES frames are buffered in host memory —
    # the full output is the per-frame PNGs written inside the loop, and a
    # whole broadcast (10k+ frames) must not accumulate gigabytes here.
    head = []
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=1) as pool:
        # decode window k+1 on a host thread while the TPU runs window k
        future = pool.submit(_load_window, opt, windows[0], sc_mask, geom)
        for k in range(len(windows)):
            frames = future.result()
            if k + 1 < len(windows):
                future = pool.submit(_load_window, opt, windows[k + 1],
                                     sc_mask, geom)
            batch = jnp.asarray(_tiles_of(frames, fs, nc))
            out = np.asarray(tiled_forward(params, bn_state, batch))
            pred = _scatter(out, fs, nc, pl, outh, outw)
            inpaint = np.where(pm, pred, frames)
            for t in range(pl):
                idx = k * pl + t + 1
                save_png(f"{out_dir}/inpaint_{idx:05d}.png", inpaint[t])
            if k * pl < GIF_MAX_FRAMES:
                head.append(inpaint)
    dt = time.perf_counter() - t0
    fps = total / dt
    print(f"streamed {total} frames in {dt:.1f}s = {fps:.1f} frames/s")
    seq = np.concatenate(head)[:GIF_MAX_FRAMES]
    if write_gif:
        # PIL GIF quantization is slow on long/large sequences: cap at 64
        # frames, half resolution (the per-frame PNGs are the full output).
        save_gif(f"{out_dir}_inpaint.gif", seq[:, ::2, ::2])
    return {"frames": seq, "n_frames": total, "fps": fps}


def main(argv: list[str]) -> None:
    extra = {"video": 0, "startFrame": None, "numFrames": None}
    rest = []
    for a in argv:
        k, _, v = a.partition("=")
        if k in ("video", "startFrame", "numFrames"):
            extra[k] = int(v)
        else:
            rest.append(a)
    opt = from_args(rest)
    run_stream(opt, video=extra["video"], start_frame=extra["startFrame"],
               num_frames=extra["numFrames"])


if __name__ == "__main__":
    main(sys.argv[1:])
