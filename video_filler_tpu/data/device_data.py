"""Device-resident dataset cache: batch synthesis inside the jit (round 5).

TPU-first input path for corpora that fit in HBM: decode the whole
train-split ONCE on the host, ship it to the device as uint8 arrays, and
synthesize every training batch INSIDE the fused step from the per-step
RNG key — XLA gathers + dynamic slices replace the host sampler threads
and the per-step host→device batch transfer.  Enabled with ``dataDevice=1``
(train/loop.py); supports every training regime.

Why this exists (beyond being the right design for small corpora on any
accelerator):

* the per-step batch upload is pure overhead the host pipeline cannot
  amortize — for the wholeim regime it is ~27 MB/step (B=32 of
  128×128×(27+12+12) uint8).  Over this environment's remote-TPU tunnel
  that same transfer is ALSO the transport's host-memory leak (~27 MB of
  host RSS retained per step; two 10k-step soak attempts died at ~130 GB
  RSS — CLAUDE.md).  With dataDevice=1 the per-step host→device traffic
  is one int32 seed.
* the batch stream becomes a pure function of (manualSeed, global step):
  an autoResume'd run replays the EXACT stream of the uninterrupted run,
  where the host loader can only draw a fresh-but-disjoint stream
  (train/loop.py's resume note).

Per-regime semantics mirror the host samplers' DISTRIBUTIONS exactly
(pinned against numpy replicas, tests/test_device_data.py); the RNG
streams differ (threefry vs numpy MT), so dataDevice=1 is a different,
equally-valid sample sequence — not a bit-identical replay of an
nThreads=N run:

* center  — uniform class → uniform image → uniform fineSize crop
            (data/donkey_folder.lua:70-88 via pipeline.center_sampler);
* logo    — uniform pair → the SAME uniform crop on both halves
            (data/donkey_folder_logo.lua:72-99; the shared flip already
            runs on device in make_preprocess);
* video / video3d — uniform video → uniform clip start → gt-variant by
            probability, channel-fold predLen frames, shared crop + the
            rescaled-mask crop, dark-crop rejection (keep p=0.05)
            (datavid/donkey_folder.lua:138-186);
* wholeim — the donkey transform: mask-fill, random translate-crop
            (≤100×70 px toward the origin, freed border zero-padded),
            hflip p=0.4, dark-top-left rejection with p=0.1 keep, and the
            arrh×arrw overlapping patch-grid slice
            (donkey_wholeim.lua:141-216; host twin: wholeim_sampler).

Requires uniform frame geometry after the loadSize resize (true for any
corpus of same-sized frames) and a deterministic loadSize (>= 0 — the
random-scale modes re-draw a scale per sample, which a one-shot cache
cannot hold); raises otherwise.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from video_filler_tpu.config import Opt
from video_filler_tpu.data import decode
from video_filler_tpu.data.index import FolderIndex, PairedIndex, VideoCorpus
from video_filler_tpu.data.pipeline import _cached_mask_at, load_mask

SUPPORTED = ("center", "logo", "video", "video3d", "wholeim")

# The wholeim donkey's translate-crop bounds (donkey_wholeim.lua:168-170):
# content shifts toward the origin by (ch-1, cw-1), ch ∈ [1,70], cw ∈ [1,100].
_TRANS_H, _TRANS_W = 70, 100


def _check_regime(opt: Opt, regime: str) -> None:
    if regime not in SUPPORTED:
        raise SystemExit(
            f"dataDevice=1 supports regimes {SUPPORTED}, not {regime!r} — "
            "use the host pipeline (nThreads=N) for this regime")
    if opt.loadSize < 0:
        raise SystemExit(
            "dataDevice=1 requires a deterministic loadSize (>= 0): the "
            "random-scale modes (loadSize < 0) re-draw a scale per sample, "
            "which the one-shot device cache cannot reproduce — use the "
            "host pipeline (nThreads=N)")


class _Geom:
    """Uniform-geometry accumulator: every decoded frame must share one
    (H, W) after the loadSize resize, else the cache has no static shape."""

    def __init__(self):
        self.hw = None

    def check(self, img, path):
        if self.hw is None:
            self.hw = img.shape[:2]
        elif img.shape[:2] != self.hw:
            raise SystemExit(
                f"dataDevice requires uniform frame geometry after the "
                f"loadSize resize; {path} decodes to {img.shape[:2]} vs "
                f"{self.hw}")


def _require_fits(hw, fs, what="the crop"):
    h, w = hw
    if h < fs or w < fs:
        # The host samplers upscale undersized frames per-sample; with a
        # uniform-geometry cache that would make EVERY sample a resize —
        # resize the corpus instead.
        raise SystemExit(
            f"dataDevice: frame geometry {(h, w)} is smaller than fineSize "
            f"{fs} — raise loadSize so {what} fits")


def _load_video_frames(opt: Opt, min_len: int):
    """Decode every eligible video's train-head frames for all variants.

    Returns (frames, meta_core): frames (n_variants, n_frames, H, W, nc)
    uint8 with every variant holding the same flattened frame list;
    meta_core = per-video offsets/counts into the flat list (counts are
    TRAIN-HEAD frame counts), variant cumprobs, hw.  Eligibility: the
    video's train head holds >= min_len frames (VideoCorpus.sample_clip's
    start-range rule for length=min_len)."""
    corpus_kw = {}
    if opt.vidExts:
        corpus_kw["suffixes"] = opt.vidExts.split(",")
        corpus_kw["counts"] = [int(c) for c in opt.vidCounts.split(",")]
    corpus = VideoCorpus(opt.DATA_ROOT,
                         variants=(("gt", 1.0 - opt.gt1Prob),
                                   ("gt1", opt.gt1Prob)),
                         split=opt.split, **corpus_kw)
    videos = [v for v in range(len(corpus.suffixes))
              if corpus.train_counts[v] >= min_len]
    if not videos:
        raise SystemExit(
            f"dataDevice: no video's train portion holds >= {min_len} "
            f"frames (split={opt.split}%)")
    variants = [name for name, _ in corpus.variants]
    probs = np.asarray([p for _, p in corpus.variants], np.float64)

    geom = _Geom()
    frames_per_variant = []
    for name in variants:
        decoded = []
        for v in videos:
            for i in range(corpus.train_counts[v]):
                path = corpus.get_clip(v, corpus.starts[v] + i, 1,
                                       variant=name)[0]
                img = decode.load_and_resize(path, opt.loadSize, opt.nc)
                geom.check(img, path)
                decoded.append(img)
        frames_per_variant.append(np.stack(decoded))
    frames = np.stack(frames_per_variant)   # (V, N, H, W, nc)

    offsets, counts, off = [], [], 0
    for v in videos:
        offsets.append(off)
        counts.append(corpus.train_counts[v])
        off += corpus.train_counts[v]
    meta = {"hw": geom.hw, "offsets": np.asarray(offsets, np.int32),
            "counts": np.asarray(counts, np.int32),
            "cumprobs": np.cumsum(probs).astype(np.float32)}
    return frames, meta


def _mask_at(opt: Opt, hw, nc: int) -> np.ndarray:
    """The global logo mask rescaled to frame geometry with the >=128
    binarization (datavid/donkey_folder.lua:109), broadcast to nc channels;
    zeros when no mask is configured (video regime without maskName)."""
    h, w = hw
    if not opt.maskName:
        return np.zeros((h, w, nc), np.uint8)
    m = _cached_mask_at(load_mask(opt.maskName), {}, h, w)
    return np.broadcast_to(m, (h, w, nc)).copy()


def load_corpus(opt: Opt, regime: str):
    """Decode the full train split to host numpy, ready for device_put.

    Returns ``(arrays, meta)``: ``arrays`` is a tuple of uint8 numpy arrays
    (regime-specific — see each branch) handed verbatim to the sampler from
    :func:`make_device_sampler`; ``meta`` holds the static tables the
    sampler closes over plus ``desc`` (a human one-liner for the loop's
    startup print)."""
    _check_regime(opt, regime)

    if regime == "center":
        # Uniform class → uniform image (data/dataset.lua:351-364): flatten
        # classes with per-class offsets so the two-level draw survives.
        index = FolderIndex(opt.DATA_ROOT, split=opt.split,
                            cache_dir=opt.cacheDir or None)
        classes = [c for c in index.classes if index.train_files[c]]
        if not classes:
            raise SystemExit("dataDevice: the train split is empty")
        geom = _Geom()
        decoded, offsets, counts = [], [], []
        for c in classes:
            offsets.append(len(decoded))
            counts.append(len(index.train_files[c]))
            for p in index.train_files[c]:
                img = decode.load_and_resize(p, opt.loadSize, opt.nc)
                geom.check(img, p)
                decoded.append(img)
        _require_fits(geom.hw, opt.fineSize)
        images = np.stack(decoded)
        meta = {"hw": geom.hw, "offsets": np.asarray(offsets, np.int32),
                "counts": np.asarray(counts, np.int32),
                "desc": f"{len(decoded)} images x {len(classes)} classes"}
        return (images,), meta

    if regime == "logo":
        # Paired masked/gt, train head of the sorted pair list
        # (PairedIndex.split); the host's per-pair size-equality assert is
        # subsumed by the uniform-geometry requirement.
        paired = PairedIndex(opt.DATA_ROOT, opt.DATA_ROOT_GT,
                             split=opt.split)
        if paired.n_train == 0:
            raise SystemExit("dataDevice: the train split is empty")
        geom = _Geom()
        ms, gs = [], []
        for pm, pg in zip(paired.masked[:paired.n_train],
                          paired.gt[:paired.n_train]):
            im = decode.load_and_resize(pm, opt.loadSize, opt.nc)
            ig = decode.load_and_resize(pg, opt.loadSize, opt.nc)
            geom.check(im, pm)
            geom.check(ig, pg)
            ms.append(im)
            gs.append(ig)
        _require_fits(geom.hw, opt.fineSize)
        meta = {"hw": geom.hw, "n": paired.n_train,
                "desc": f"{paired.n_train} masked/gt pairs"}
        return (np.stack(ms), np.stack(gs)), meta

    if regime in ("video", "video3d"):
        frames, meta = _load_video_frames(opt, min_len=opt.predLen)
        _require_fits(meta["hw"], opt.fineSize)
        meta["desc"] = (f"{frames.shape[1]} frames x {frames.shape[0]} "
                        f"variants ({meta['counts'].shape[0]} videos)")
        return (frames, _mask_at(opt, meta["hw"], 1)), meta

    # wholeim
    if not opt.maskName:
        raise SystemExit("wholeim regime requires maskName")
    frames, meta = _load_video_frames(opt, min_len=1)
    meta["desc"] = (f"{frames.shape[1]} frames x {frames.shape[0]} "
                    f"variants ({meta['counts'].shape[0]} videos)")
    return (frames, _mask_at(opt, meta["hw"], opt.nc)), meta


def _uniform_index(key, count):
    """Uniform int in [0, count) for a TRACED count (variable per video/
    class, so jax.random.randint's static bounds don't apply):
    floor(u * count); the ~2^-24 float bias is immaterial."""
    return jnp.minimum((jax.random.uniform(key) * count).astype(jnp.int32),
                       count - 1)


def _crop_yx(kh, kw, h, w, fs):
    """The host samplers' crop-offset rule (_random_crop_hw):
    uniform in [0, max(dim - fs, 1))."""
    return (jax.random.randint(kh, (), 0, max(h - fs, 1)),
            jax.random.randint(kw, (), 0, max(w - fs, 1)))


def make_device_sampler(opt: Opt, regime: str, meta):
    """jit-able ``sample(arrays, key) -> host-batch-shaped dict`` (uint8,
    same keys/values as the regime's host sampler batches, so the regular
    make_preprocess consumes it unchanged).  ``arrays`` is the tuple
    :func:`load_corpus` returned (device-resident by the time it matters)."""
    _check_regime(opt, regime)
    if regime == "center":
        return _make_center(opt, meta)
    if regime == "logo":
        return _make_logo(opt, meta)
    if regime in ("video", "video3d"):
        return _make_video(opt, meta)
    return _make_wholeim(opt, meta)


def _batched(sample_one, batch_size):
    def sample(arrays, key):
        keys = jax.random.split(key, batch_size)
        return jax.vmap(sample_one, in_axes=(None, 0))(arrays, keys)
    return sample


def _make_center(opt: Opt, meta):
    fs = opt.fineSize
    h, w = meta["hw"]
    offsets = jnp.asarray(meta["offsets"])
    counts = jnp.asarray(meta["counts"])
    n_classes = int(meta["counts"].shape[0])

    def sample_one(arrays, key):
        (images,) = arrays
        kc, ki, kh, kw_ = jax.random.split(key, 4)
        c = jax.random.randint(kc, (), 0, n_classes)
        i = _uniform_index(ki, counts[c])
        y, x = _crop_yx(kh, kw_, h, w, fs)
        img = images[offsets[c] + i]
        return {"raw": lax.dynamic_slice(img, (y, x, 0),
                                         (fs, fs, opt.nc))}

    return _batched(sample_one, opt.batchSize)


def _make_logo(opt: Opt, meta):
    fs = opt.fineSize
    h, w = meta["hw"]
    n = int(meta["n"])

    def sample_one(arrays, key):
        masked, gt = arrays
        ki, kh, kw_ = jax.random.split(key, 3)
        i = jax.random.randint(ki, (), 0, n)
        y, x = _crop_yx(kh, kw_, h, w, fs)   # ONE crop for both halves
        crop = lambda a: lax.dynamic_slice(a[i], (y, x, 0),  # noqa: E731
                                           (fs, fs, opt.nc))
        return {"raw_masked": crop(masked), "raw_gt": crop(gt)}

    return _batched(sample_one, opt.batchSize)


def _make_video(opt: Opt, meta):
    fs, pl, nc = opt.fineSize, opt.predLen, opt.nc
    h, w = meta["hw"]
    offsets = jnp.asarray(meta["offsets"])
    # n_starts per video: train-head frames minus the clip length
    # (VideoCorpus._start_range); eligibility (> 0) was enforced at load.
    n_starts = jnp.asarray(meta["counts"]) - (pl - 1)
    cumprobs = jnp.asarray(meta["cumprobs"])
    n_videos = int(meta["counts"].shape[0])
    n_variants = int(meta["cumprobs"].shape[0])

    def _attempt(arrays, key):
        frames, mask1 = arrays
        kv, kf, kvar, kh, kw_, kdark, knext = jax.random.split(key, 7)
        v = jax.random.randint(kv, (), 0, n_videos)
        f = _uniform_index(kf, n_starts[v])
        r = jax.random.uniform(kvar)
        variant = jnp.minimum(jnp.sum(r >= cumprobs),
                              n_variants - 1).astype(jnp.int32)
        clip = lax.dynamic_slice(
            frames, (variant, offsets[v] + f, 0, 0, 0),
            (1, pl, h, w, nc))[0]                       # (pl, H, W, nc)
        # Channel-fold: frame-major channel order, identical to the host's
        # np.concatenate(frames, axis=-1) (datavid/donkey_folder.lua:138).
        folded = jnp.moveaxis(clip, 0, 2).reshape(h, w, pl * nc)
        y, x = _crop_yx(kh, kw_, h, w, fs)
        crop = lax.dynamic_slice(folded, (y, x, 0), (fs, fs, pl * nc))
        msk = lax.dynamic_slice(mask1, (y, x, 0), (fs, fs, 1))
        # dark-crop rejection, keep p=0.05 (datavid/donkey_folder.lua:150-155)
        reject = (jnp.mean(crop.astype(jnp.float32)) < 0.1 * 255.0) & \
            (jax.random.uniform(kdark) <= 0.95)
        return reject, knext, crop, msk

    def sample_one(arrays, key):
        init = _attempt(arrays, key)
        out = lax.while_loop(lambda c: c[0],
                             lambda c: _attempt(arrays, c[1]), init)
        return {"raw": out[2], "mask": out[3]}

    return _batched(sample_one, opt.batchSize)


def _make_wholeim(opt: Opt, meta):
    fs, nc = opt.fineSize, opt.nc
    arrh, arrw = opt.array_h, opt.array_w
    outh, outw = opt.out_h, opt.out_w
    h, w = meta["hw"]
    _require_fits(meta["hw"], fs, what="the patch grid")
    fill = jnp.uint8(int(round(opt.maskValue * 255.0)))
    offsets = jnp.asarray(meta["offsets"])
    counts = jnp.asarray(meta["counts"])
    cumprobs = jnp.asarray(meta["cumprobs"])
    n_videos = int(meta["counts"].shape[0])
    steph = (h - fs) // (arrh - 1)
    stepw = (w - fs) // (arrw - 1)

    def _transform(img, mask3, ch, cw, flip):
        """The donkey transform for ONE frame with explicit randomness
        (mask-fill → translate → flip → slice); returns the three patch
        arrays plus the dark-check mean.  Pure function of its inputs so
        tests can pin it against a numpy replica of the host sampler."""
        masked = jnp.where(mask3 > 0, fill, img)

        def translate(a):
            # out[:h-ch+1, :w-cw+1] = a[ch-1:, cw-1:], zero-padded border
            # (donkey_wholeim.lua:168-174): slide a zero-extended frame.
            pad = jnp.pad(a, ((0, _TRANS_H), (0, _TRANS_W), (0, 0)))
            return lax.dynamic_slice(pad, (ch - 1, cw - 1, 0), (h, w, nc))

        img_t = translate(img)
        m_t = translate(mask3)
        masked_t = translate(masked)
        img_t, m_t, masked_t = (jnp.where(flip, a[:, ::-1], a)
                                for a in (img_t, m_t, masked_t))
        dark_mean = jnp.mean(img_t[:fs, :fs].astype(jnp.float32))

        mp, op, kp = [], [], []
        for hi in range(arrh):
            for wi in range(arrw):
                y, x = hi * steph, wi * stepw
                mp.append(masked_t[y:y + fs, x:x + fs])
                if hi < outh and wi < outw:
                    op.append(img_t[y:y + fs, x:x + fs])
                    kp.append(m_t[y:y + fs, x:x + fs])
        # Host layout: masked in row-major (hi, wi) grid order; targets in
        # oi = hi*outw + wi order — list order here matches both.
        return (jnp.concatenate(mp, -1), jnp.concatenate(op, -1),
                jnp.concatenate(kp, -1), dark_mean)

    def _attempt(arrays, key):
        frames, mask3 = arrays
        kv, kf, kvar, kh, kw_, kflip, kdark, knext = jax.random.split(key, 8)
        v = jax.random.randint(kv, (), 0, n_videos)
        f = _uniform_index(kf, counts[v])
        # variant by cumulative probability — same acc-loop semantics as
        # VideoCorpus.sample_clip (last variant is the fallback)
        r = jax.random.uniform(kvar)
        variant = jnp.minimum(jnp.sum(r >= cumprobs),
                              len(meta["cumprobs"]) - 1).astype(jnp.int32)
        img = frames[variant, offsets[v] + f]
        ch = jax.random.randint(kh, (), 1, _TRANS_H + 1)
        cw = jax.random.randint(kw_, (), 1, _TRANS_W + 1)
        flip = jax.random.uniform(kflip) > 0.6     # hflip p=0.4
        mp, op, kp, dark_mean = _transform(img, mask3, ch, cw, flip)
        # dark top-left patch rejection, keep anyway with p=0.1
        # (donkey_wholeim.lua:185-188 via pipeline.wholeim_sampler)
        reject = (dark_mean < 0.1 * 255.0) & \
            (jax.random.uniform(kdark) <= 0.9)
        return reject, knext, mp, op, kp

    def sample_one(arrays, key):
        init = _attempt(arrays, key)
        out = lax.while_loop(lambda c: c[0],
                             lambda c: _attempt(arrays, c[1]), init)
        return {"raw_masked": out[2], "raw_real": out[3], "mask": out[4]}

    sample = _batched(sample_one, opt.batchSize)
    sample.transform = _transform   # exposed for the numpy-replica parity
    return sample                   # test (tests/test_device_data.py)


class NullLoader:
    """DataLoader stand-in when batches are synthesized on device: the
    train loop's pump/close calls become no-ops."""

    def get_batch(self):
        return None

    def close(self):
        pass
