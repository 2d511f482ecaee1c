"""Device-resident dataset cache: batch synthesis inside the jit (round 5).

TPU-first input path for corpora that fit in HBM: decode the whole
train-split ONCE on the host, ship it to the device as one uint8 array,
and synthesize every training batch INSIDE the fused step from the
per-step RNG key — XLA gathers + dynamic slices replace the host sampler
threads and the per-step host→device batch transfer.  Enabled with
``dataDevice=1`` (train/loop.py).

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

Semantics mirror the host sampler's DISTRIBUTION exactly — uniform video
→ uniform frame → gt-variant by probability (datavid/dataset.lua:360-378
via index.VideoCorpus.sample_clip), then the donkey transform: mask-fill,
random translate-crop (≤100×70 px toward the origin, freed border
zero-padded), hflip p=0.4, dark-top-left rejection with p=0.1 keep, and
the arrh×arrw overlapping patch-grid slice (donkey_wholeim.lua:141-216;
host twin: pipeline.wholeim_sampler).  The RNG streams differ (threefry
vs numpy MT), so dataDevice=1 is a different, equally-valid sample
sequence — not a bit-identical replay of an nThreads=N run.

Requires uniform frame geometry after the loadSize resize (true for any
corpus of same-sized frames); raises otherwise.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from video_filler_tpu.config import Opt
from video_filler_tpu.data import decode
from video_filler_tpu.data.index import VideoCorpus
from video_filler_tpu.data.pipeline import _cached_mask_at, load_mask

SUPPORTED = ("wholeim",)

# The donkey's translate-crop bounds (donkey_wholeim.lua:168-170): content
# shifts toward the origin by (ch-1, cw-1) with ch ∈ [1,70], cw ∈ [1,100].
_TRANS_H, _TRANS_W = 70, 100


def load_corpus(opt: Opt, regime: str):
    """Decode the full train split to host numpy, ready for device_put.

    Returns ``(arrays, meta)``: ``arrays`` = (frames, mask3) — frames
    (n_variants, n_frames, H, W, nc) uint8 with every variant holding the
    same flattened frame list, mask3 (H, W, nc) uint8 {0,1} pre-rescaled
    to frame geometry — and ``meta`` = static tables for the sampler
    (per-video offsets/counts into the flat list, variant cumprobs)."""
    if regime not in SUPPORTED:
        raise SystemExit(
            f"dataDevice=1 supports regimes {SUPPORTED}, not {regime!r} — "
            "use the host pipeline (nThreads=N) for this regime")
    corpus_kw = {}
    if opt.vidExts:
        corpus_kw["suffixes"] = opt.vidExts.split(",")
        corpus_kw["counts"] = [int(c) for c in opt.vidCounts.split(",")]
    corpus = VideoCorpus(opt.DATA_ROOT,
                         variants=(("gt", 1.0 - opt.gt1Prob),
                                   ("gt1", opt.gt1Prob)),
                         split=opt.split, **corpus_kw)
    if not opt.maskName:
        raise SystemExit("wholeim regime requires maskName")
    mask = load_mask(opt.maskName)

    # Flatten each video's train-head frames; sample_clip(length=1)
    # eligibility is train_counts[v] >= 1.
    videos = [v for v in range(len(corpus.suffixes))
              if corpus.train_counts[v] >= 1]
    if not videos:
        raise SystemExit("dataDevice: every video's train portion is empty")
    variants = [name for name, _ in corpus.variants]
    probs = np.asarray([p for _, p in corpus.variants], np.float64)

    frames_per_variant = []
    hw = None
    for name in variants:
        decoded = []
        for v in videos:
            for i in range(corpus.train_counts[v]):
                path = corpus.get_clip(v, corpus.starts[v] + i, 1,
                                       variant=name)[0]
                img = decode.load_and_resize(path, opt.loadSize, opt.nc)
                if hw is None:
                    hw = img.shape[:2]
                elif img.shape[:2] != hw:
                    raise SystemExit(
                        f"dataDevice requires uniform frame geometry after "
                        f"the loadSize resize; {path} decodes to "
                        f"{img.shape[:2]} vs {hw}")
                decoded.append(img)
        frames_per_variant.append(np.stack(decoded))
    frames = np.stack(frames_per_variant)   # (V, N, H, W, nc)

    offsets, counts, off = [], [], 0
    for v in videos:
        offsets.append(off)
        counts.append(corpus.train_counts[v])
        off += corpus.train_counts[v]

    h, w = hw
    mask3 = np.broadcast_to(_cached_mask_at(mask, {}, h, w),
                            (h, w, opt.nc)).copy()
    meta = {"hw": hw, "offsets": np.asarray(offsets, np.int32),
            "counts": np.asarray(counts, np.int32),
            "cumprobs": np.cumsum(probs).astype(np.float32)}
    return (frames, mask3), meta


def make_device_sampler(opt: Opt, regime: str, meta):
    """jit-able ``sample(frames, mask3, key) -> host-batch-shaped dict``
    (uint8, same keys/values as pipeline.wholeim_sampler's batches, so the
    regular make_preprocess consumes it unchanged)."""
    if regime not in SUPPORTED:
        raise SystemExit(f"dataDevice=1 supports {SUPPORTED}, not {regime!r}")
    fs, nc = opt.fineSize, opt.nc
    arrh, arrw = opt.array_h, opt.array_w
    outh, outw = opt.out_h, opt.out_w
    h, w = meta["hw"]
    if h < fs or w < fs:
        # The host sampler upscales undersized frames per-sample; with a
        # uniform-geometry cache that would make EVERY sample a resize —
        # resize the corpus instead.
        raise SystemExit(
            f"dataDevice: frame geometry {(h, w)} is smaller than "
            f"fineSize {fs} — raise loadSize so the patch grid fits")
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

    def _attempt(frames, mask3, key):
        kv, kf, kvar, kh, kw_, kflip, kdark, knext = jax.random.split(key, 8)
        v = jax.random.randint(kv, (), 0, n_videos)
        # uniform frame within the video's train head (variable count per
        # video → floor(u * n); the ~2^-24 float bias is immaterial)
        f = jnp.minimum(
            (jax.random.uniform(kf) * counts[v]).astype(jnp.int32),
            counts[v] - 1)
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

    def _sample_one(frames, mask3, key):
        init = _attempt(frames, mask3, key)
        out = lax.while_loop(lambda c: c[0],
                             lambda c: _attempt(frames, mask3, c[1]), init)
        return out[2], out[3], out[4]

    def sample(frames, mask3, key):
        keys = jax.random.split(key, opt.batchSize)
        mp, op, kp = jax.vmap(_sample_one, in_axes=(None, None, 0))(
            frames, mask3, keys)
        return {"raw_masked": mp, "raw_real": op, "mask": kp}

    sample.transform = _transform   # exposed for the numpy-replica parity
    return sample                   # test (tests/test_device_data.py)


class NullLoader:
    """DataLoader stand-in when batches are synthesized on device: the
    train loop's pump/close calls become no-ops."""

    def get_batch(self):
        return None

    def close(self):
        pass
