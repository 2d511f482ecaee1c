"""Quality + throughput metrics harness.

The reference publishes no PSNR/SSIM/L2 numbers (BASELINE.md); its quality
control is visual.  This module makes the quantitative story first-class:
reconstruction metrics over held-out batches and generator inference
throughput, written as a BASELINE.md-style markdown table
(SURVEY §7 build-plan item 9).

CLI:
    python -m video_filler_tpu.eval.metrics regime=video net=checkpoints/... \
        DATA_ROOT=... maskName=... [reportPath=metrics.md]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from video_filler_tpu.config import Opt, from_args
from video_filler_tpu.data.pipeline import make_sampler
from video_filler_tpu.eval.common import gen_input, load_generator
from video_filler_tpu.ops import losses, masks
from video_filler_tpu.train.step import make_preprocess


def _prepare(opt: Opt, regime: str, batch):
    """(g_input, target, mask_or_none) for a preprocessed batch."""
    if regime == "center":
        ctx = masks.center_mask_fill(batch["real"], opt.overlapPred)
        return ctx, masks.extract_center(batch["real"]), None
    if regime in ("video", "video3d"):
        ctx = masks.apply_logo_mask(batch["real"], batch["mask"],
                                    opt.maskValue)
        return ctx, batch["real"], batch["mask"]
    if regime in ("logo", "wholeim"):
        return batch["masked"], batch["real"], batch.get("mask")
    raise ValueError(regime)


def evaluate(opt: Opt, regime: str, n_batches: int = 8,
             seed: int = 222, loaded=None) -> dict:
    """Reconstruction quality of `opt.net` over `n_batches` sampled batches:
    full-frame and hole-only L2 + PSNR (range 2.0, [-1,1] images).

    Full-frame rows are mask-composites (prediction inside the hole, ground
    truth outside) for EVERY regime — center included, via the demo.lua:73-76
    paste-back — so the domain is comparable across regimes.  Hole-only L2
    is measured on the raw predicted region.

    Draws from Opt.evalSplit ("test" + split<100 for held-out metrics —
    folder datasets reserve a shuffled image tail, video corpora a
    contiguous frame tail per video, the paired logo dataset a tail of the
    sorted pair list.  Default "train" matches the reference's test
    scripts, which sample the training pump).

    Besides the means, returns the ACROSS-BATCH standard deviation of each
    metric (`*_std`) so small train-vs-held-out deltas can be read against
    the eval noise floor.

    `loaded` short-circuits the checkpoint load with an existing
    (forward, params, bn_state) triple — one load/upload shared with
    bench_inference instead of two (the upload is minutes over the tunnel)."""
    sampler, _ = make_sampler(opt, regime, split=opt.evalSplit)
    preprocess = make_preprocess(opt, regime)
    forward, params, bn_state = loaded or load_generator(opt, regime, opt.net)
    rs = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)

    l2s, psnrs, hole_l2s, ssims = [], [], [], []
    for _ in range(n_batches):
        key, sub = jax.random.split(key)
        batch = preprocess(jax.tree.map(jnp.asarray, sampler(rs)), sub)
        ctx, target, mask = _prepare(opt, regime, batch)
        x = ctx
        if opt.noiseGen:  # guarded split: keeps non-noiseGen key streams
            key, kz = jax.random.split(key)  # (= prior ledgers) unchanged
            x = gen_input(opt, ctx, kz)
        pred = forward(params, bn_state, x)
        if regime == "center":
            # hole metrics stay in the predicted-crop domain; full-frame
            # metrics composite the crop into the real 128² frame
            hole_pred, hole_target = pred, target
            target = batch["real"]
            pred_full = masks.paste_center(target, pred, opt.overlapPred)
        elif mask is not None:
            pred_full = masks.fill_in(target, mask, pred)
        else:
            pred_full = pred
        l2s.append(float(losses.mse(pred_full, target)))
        psnrs.append(float(losses.psnr(pred_full, target)))
        pf, tf = pred_full, target
        if pf.ndim == 5:  # temporal clips: fold T into the batch for SSIM
            pf = pf.reshape((-1,) + pf.shape[2:])
            tf = tf.reshape((-1,) + tf.shape[2:])
        ssims.append(float(losses.ssim(pf, tf)))
        if regime == "center":
            hole_l2s.append(float(losses.mse(hole_pred, hole_target)))
        elif mask is not None:
            m = jnp.broadcast_to(mask.astype(bool), pred.shape)
            denom = jnp.maximum(jnp.sum(m), 1)
            hole_l2s.append(float(
                jnp.sum(jnp.where(m, jnp.square(pred - target), 0.0)) / denom))
        else:
            hole_l2s.append(float(losses.mse(pred, target)))
    return {
        "l2": float(np.mean(l2s)),
        "psnr_db": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "hole_l2": float(np.mean(hole_l2s)),
        # per-batch dispersion (population std over the n_batches scores)
        "l2_std": float(np.std(l2s)),
        "psnr_db_std": float(np.std(psnrs)),
        "ssim_std": float(np.std(ssims)),
        "hole_l2_std": float(np.std(hole_l2s)),
        "n_batches": n_batches,
        "batchSize": opt.batchSize,
    }


def bench_inference(opt: Opt, regime: str, iters: int = 50,
                    loaded=None) -> dict:
    """Generator inference throughput (frames/sec) on synthetic input.
    `loaded` reuses an existing (forward, params, bn_state) triple."""
    forward, params, bn_state = loaded or load_generator(opt, regime, opt.net)
    rs = np.random.RandomState(0)
    if regime == "video3d":
        from video_filler_tpu.models import video3d_fine_size
        side = video3d_fine_size(opt)  # the 3D family's input size is
        # set by its spatial-halving count, not fixed at 128
        shape = (opt.batchSize, opt.predLen, side, side, opt.nc)
    else:
        from video_filler_tpu.models import specs_for_regime
        gspec, _ = specs_for_regime(opt, regime)
        shape = (opt.batchSize, 128, 128, gspec.nc_in)
    x = jnp.asarray(rs.rand(*shape).astype(np.float32) * 2 - 1)
    if opt.noiseGen:
        x = gen_input(opt, x, jax.random.PRNGKey(0))
    # Timing MUST end with a value fetch: on the remote (axon) TPU backend
    # block_until_ready does not wait for execution, reading ~3.5x too fast
    # (repo invariant, CLAUDE.md; bench.py does the same).
    float(jnp.sum(forward(params, bn_state, x)))  # warmup + force
    t0 = time.perf_counter()
    for _ in range(iters):
        y = forward(params, bn_state, x)
    float(jnp.sum(y))  # blocks on the whole dependency chain
    dt = (time.perf_counter() - t0) / iters
    frames_per_clip = max(opt.predLen, 1)
    return {
        "clips_per_sec": opt.batchSize / dt,
        "frames_per_sec": opt.batchSize * frames_per_clip / dt,
        "batch_latency_ms": dt * 1e3,
    }


def write_report(path: str, regime: str, quality: dict, speed: dict) -> None:
    lines = [
        f"# Metrics — regime `{regime}`", "",
        "| Metric | Value |", "|---|---|",
        f"| full-frame L2 ([-1,1] space) | {quality['l2']:.5f} |",
        f"| hole-only L2 | {quality['hole_l2']:.5f} |",
        f"| PSNR | {quality['psnr_db']:.2f} dB |",
        f"| SSIM | {quality['ssim']:.4f} |",
        f"| inference clips/s | {speed['clips_per_sec']:.1f} |",
        f"| inference frames/s | {speed['frames_per_sec']:.1f} |",
        f"| batch latency | {speed['batch_latency_ms']:.2f} ms |",
        "",
        f"(batches={quality['n_batches']}, batchSize={quality['batchSize']}; "
        "full-frame rows are mask-composites — prediction inside the hole, "
        "ground truth outside)",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def main(argv: list[str]) -> None:
    regime = "center"
    report_path = "metrics.md"
    rest = []
    for a in argv:
        k, _, v = a.partition("=")
        if k == "regime":
            regime = v
        elif k == "reportPath":
            report_path = v
        else:
            rest.append(a)
    opt = from_args(rest)
    loaded = load_generator(opt, regime, opt.net)
    quality = evaluate(opt, regime, loaded=loaded)
    speed = bench_inference(opt, regime, loaded=loaded)
    write_report(report_path, regime, quality, speed)
    print(json.dumps({**quality, **speed}))


if __name__ == "__main__":
    main(sys.argv[1:])
