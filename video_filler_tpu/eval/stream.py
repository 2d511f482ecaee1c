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

import math
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
from video_filler_tpu.ops import masks
from video_filler_tpu.utils import save_gif, save_png

VFLIP_TOP_TILES = 3


def _prep_geometry(opt: Opt, corpus: VideoCorpus, mask01: np.ndarray):
    probe = decode.decode_image(corpus.get_clip(0, corpus.starts[0], 1)[0],
                                opt.nc)
    orih, oriw = probe.shape[:2]
    inh = opt.loadSize
    inw = round(opt.loadSize * oriw / orih)
    outh = math.ceil(inh / opt.fineSize) * opt.fineSize
    outw = math.ceil(inw / opt.fineSize) * opt.fineSize
    sc = decode.resize((mask01 * 255).astype(np.uint8), inh, inw)
    sc_mask = masks.binarize_mask(sc.astype(np.float32) / 255.0, "gt03")
    padmask = np.zeros((outh, outw, 1), np.uint8)
    padmask[:inh, :inw] = sc_mask
    return sc_mask, padmask, (inh, inw, outh, outw)


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
    tiles = []
    for th in range(outh // fs):
        for tw in range(outw // fs):
            tile = folded[th * fs:(th + 1) * fs, tw * fs:(tw + 1) * fs]
            if th == 0 and tw < VFLIP_TOP_TILES:
                tile = tile[::-1]
            tiles.append(tile)
    return np.stack(tiles)


def _scatter(out: np.ndarray, fs: int, nc: int, t: int, outh: int, outw: int):
    pred = np.zeros((outh, outw, t * nc), out.dtype)
    i = 0
    for th in range(outh // fs):
        for tw in range(outw // fs):
            tile = out[i]
            if th == 0 and tw < VFLIP_TOP_TILES:
                tile = tile[::-1]
            pred[th * fs:(th + 1) * fs, tw * fs:(tw + 1) * fs] = tile
            i += 1
    return pred.reshape(outh, outw, t, nc).transpose(2, 0, 1, 3)


def run_stream(opt: Opt, video: int = 0, start_frame: int | None = None,
               num_frames: int | None = None, out_dir: str | None = None,
               write_gif: bool = True):
    corpus = VideoCorpus(opt.DATA_ROOT,
                         variants=(("gt", 1.0 - opt.gt1Prob),
                                   ("gt1", opt.gt1Prob)))
    mask01 = decode.decode_image(opt.maskName, nc=1).astype(np.float32) / 255.0
    sc_mask, padmask, geom = _prep_geometry(opt, corpus, mask01)
    inh, inw, outh, outw = geom
    fs, nc, pl = opt.fineSize, opt.nc, opt.predLen

    start = start_frame or corpus.starts[video]
    total = num_frames or (corpus.counts[video]
                           - (start - corpus.starts[video]))
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
    inpainted_all = []
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
            inpainted_all.append(inpaint)
    dt = time.perf_counter() - t0
    fps = total / dt
    print(f"streamed {total} frames in {dt:.1f}s = {fps:.1f} frames/s")
    seq = np.concatenate(inpainted_all)
    if write_gif:
        # PIL GIF quantization is slow on long/large sequences: cap at 64
        # frames, half resolution (the per-frame PNGs are the full output).
        gif = seq[:64, ::2, ::2]
        save_gif(f"{out_dir}_inpaint.gif", gif)
    return {"frames": seq, "fps": fps}


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
