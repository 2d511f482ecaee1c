"""Device-resident dataset cache (data/device_data.py, ``dataDevice=1``).

The in-jit batch synthesis must reproduce each host sampler's semantics
(pinned against numpy replicas / value-coded corpora here), produce
host-batch-shaped uint8 dicts, make the batch stream a deterministic
function of (seed, step), and train end-to-end through the real loop —
for every regime (center / logo / video / video3d / wholeim)."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_filler_tpu.config import Opt
from video_filler_tpu.data import device_data, synthetic
from video_filler_tpu.train.loop import train
from video_filler_tpu.utils.io import save_png

TINY = dict(nef=8, ngf=8, ndf=8, nBottleneck=32, batchSize=2, nThreads=0,
            computeDtype="float32", niter=1, ntrain=8, manualSeed=222,
            display=False, checkpointEvery=1, dataDevice=True)


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vids"))
    synthetic.make_video_corpus(root, n_videos=2, frames=8, h=180, w=240)
    synthetic.make_mask_png(os.path.join(root, "mask.png"), h=180, w=240)
    return root


@pytest.fixture(scope="module")
def coded_video_root(tmp_path_factory):
    """Corpus whose frames are CONSTANT value 50*video + frame_index, so a
    sampled clip's identity (video, start, consecutiveness) is readable
    from the pixel values."""
    root = str(tmp_path_factory.mktemp("codedvids"))
    for variant in ("gt", "gt1"):
        d = os.path.join(root, variant)
        os.makedirs(d)
        for v in range(2):
            for t in range(8):
                img = np.full((140, 160, 3), 50 * v + t, np.uint8)
                save_png(os.path.join(d, f"{t + 1:07d}_vid{v}.png"), img)
    synthetic.make_mask_png(os.path.join(root, "mask.png"), h=140, w=160)
    return root


@pytest.fixture(scope="module")
def class_image_root(tmp_path_factory):
    """Two class subdirs of CONSTANT images: class a = {10, 40, 70} (3
    images), class b = {200} (1 image) — class identity readable from crop
    values, class-uniform vs image-uniform sampling distinguishable by
    frequency."""
    root = str(tmp_path_factory.mktemp("classims"))
    for cls, values in (("a", (10, 40, 70)), ("b", (200,))):
        d = os.path.join(root, cls)
        os.makedirs(d)
        for i, val in enumerate(values):
            save_png(os.path.join(d, f"im_{i}.png"),
                     np.full((140, 150, 3), val, np.uint8))
    return root


@pytest.fixture(scope="module")
def paired_root(tmp_path_factory):
    """Pairs with gt = constant 10*i, masked = gt + 5: pair identity and
    crop alignment readable from values."""
    root = str(tmp_path_factory.mktemp("pairs"))
    dm, dg = os.path.join(root, "masked"), os.path.join(root, "gt_pairs")
    os.makedirs(dm)
    os.makedirs(dg)
    for i in range(6):
        save_png(os.path.join(dg, f"im_{i}.png"),
                 np.full((140, 150, 3), 10 * i, np.uint8))
        save_png(os.path.join(dm, f"im_{i}.png"),
                 np.full((140, 150, 3), 10 * i + 5, np.uint8))
    return dm, dg


def _opt(video_root, **kw):
    return Opt(**{"DATA_ROOT": video_root, "loadSize": 0, "wtl2": 0.999,
                  "maskName": os.path.join(video_root, "mask.png"),
                  **TINY, **kw})


def _numpy_transform(img, mask3, fill, fs, arrh, arrw, outh, outw,
                     ch, cw, flip):
    """Replica of pipeline.wholeim_sampler's _transform with the random
    draws made explicit (mask-fill -> translate -> flip -> slice)."""
    h, w = img.shape[:2]
    nc = img.shape[-1]
    masked = np.where(mask3 > 0, np.uint8(fill), img)

    def translate(a):
        out = np.zeros_like(a)
        out[: h - ch + 1, : w - cw + 1] = a[ch - 1:, cw - 1:]
        return out

    img_t, m_t, masked_t = translate(img), translate(mask3), translate(masked)
    if flip:
        img_t, m_t, masked_t = (np.ascontiguousarray(a[:, ::-1])
                                for a in (img_t, m_t, masked_t))
    steph = (h - fs) // (arrh - 1)
    stepw = (w - fs) // (arrw - 1)
    mp = np.empty((fs, fs, nc * arrh * arrw), np.uint8)
    op = np.empty((fs, fs, nc * outh * outw), np.uint8)
    kp = np.zeros((fs, fs, nc * outh * outw), np.uint8)
    pi = 0
    for hi in range(arrh):
        for wi in range(arrw):
            y, x = hi * steph, wi * stepw
            mp[..., pi * nc:(pi + 1) * nc] = masked_t[y:y + fs, x:x + fs]
            if hi < outh and wi < outw:
                oi = hi * outw + wi
                op[..., oi * nc:(oi + 1) * nc] = img_t[y:y + fs, x:x + fs]
                kp[..., oi * nc:(oi + 1) * nc] = m_t[y:y + fs, x:x + fs]
            pi += 1
    return mp, op, kp, img_t[:fs, :fs].mean()


def test_transform_matches_numpy_replica(video_root):
    opt = _opt(video_root)
    (frames, mask3), meta = device_data.load_corpus(opt, "wholeim")
    sampler = device_data.make_device_sampler(opt, "wholeim", meta)
    fill = int(round(opt.maskValue * 255.0))
    img = frames[1, 3]
    # corner cases: identity shift, max shift, both flip states
    for ch, cw, flip in [(1, 1, False), (70, 100, True), (13, 57, True),
                         (70, 1, False), (1, 100, False)]:
        mp, op, kp, dark = sampler.transform(jnp.asarray(img),
                                             jnp.asarray(mask3),
                                             ch, cw, flip)
        emp, eop, ekp, edark = _numpy_transform(
            img, mask3, fill, opt.fineSize, opt.array_h, opt.array_w,
            opt.out_h, opt.out_w, ch, cw, flip)
        np.testing.assert_array_equal(np.asarray(mp), emp)
        np.testing.assert_array_equal(np.asarray(op), eop)
        np.testing.assert_array_equal(np.asarray(kp), ekp)
        assert float(dark) == pytest.approx(edark, rel=1e-5)


def test_sampler_batches_and_determinism(video_root):
    opt = _opt(video_root, batchSize=4)
    (frames, mask3), meta = device_data.load_corpus(opt, "wholeim")
    # 2 variants x (2 videos x 8 frames at split=100), uniform geometry
    assert frames.shape == (2, 16, 180, 240, 3)
    assert set(np.unique(mask3)) <= {0, 1}
    sample = jax.jit(device_data.make_device_sampler(opt, "wholeim", meta))
    dev = (jnp.asarray(frames), jnp.asarray(mask3))
    b1 = sample(dev, jax.random.PRNGKey(7))
    nc, fs = opt.nc, opt.fineSize
    assert b1["raw_masked"].shape == (4, fs, fs, nc * 9)
    assert b1["raw_real"].shape == (4, fs, fs, nc * 4)
    assert b1["mask"].shape == (4, fs, fs, nc * 4)
    assert all(v.dtype == jnp.uint8 for v in b1.values())
    # the masked input really is mask-filled: where the (untranslated-
    # corner) mask is 1 in the first patch, the fill value must appear
    fill = int(round(opt.maskValue * 255.0))
    b2 = sample(dev, jax.random.PRNGKey(7))
    for k in b1:
        np.testing.assert_array_equal(np.asarray(b1[k]), np.asarray(b2[k]))
    b3 = sample(dev, jax.random.PRNGKey(8))
    assert any(not np.array_equal(np.asarray(b1[k]), np.asarray(b3[k]))
               for k in b1)
    # fill value occurs in masked patches (the mask region is nonempty)
    assert (np.asarray(b1["raw_masked"]) == fill).any()


def test_center_sampler_class_uniform(class_image_root):
    """Crops come only from the corpus images, and classes are drawn
    UNIFORMLY (class b holds 1 of 3 images but must get ~1/2 of the draws
    — data/dataset.lua:351-364's two-level draw, not flat-uniform)."""
    opt = Opt(DATA_ROOT=class_image_root, loadSize=0,
              **{**TINY, "batchSize": 16})
    arrays, meta = device_data.load_corpus(opt, "center")
    assert arrays[0].shape == (4, 140, 150, 3)
    sample = jax.jit(device_data.make_device_sampler(opt, "center", meta))
    dev = tuple(jnp.asarray(a) for a in arrays)
    vals = []
    for s in range(8):   # 128 draws
        b = np.asarray(sample(dev, jax.random.PRNGKey(s))["raw"])
        assert b.shape == (16, opt.fineSize, opt.fineSize, 3)
        assert b.dtype == np.uint8
        for i in range(b.shape[0]):
            u = np.unique(b[i])
            assert u.size == 1 and int(u[0]) in (10, 40, 70, 200)
            vals.append(int(u[0]))
    n_b = sum(v == 200 for v in vals)
    # class-uniform: E[n_b] = 64 of 128 (flat-uniform would be 32);
    # binomial(128, .5) is within [44, 84] at ~3.7 sigma
    assert 44 <= n_b <= 84


def test_logo_sampler_pairs_aligned(paired_root):
    """masked/gt crops come from the SAME pair at the SAME offsets
    (value-coded: masked == gt + 5 everywhere)."""
    dm, dg = paired_root
    opt = Opt(DATA_ROOT=dm, DATA_ROOT_GT=dg, loadSize=0,
              **{**TINY, "batchSize": 8})
    arrays, meta = device_data.load_corpus(opt, "logo")
    assert arrays[0].shape == arrays[1].shape == (6, 140, 150, 3)
    sample = jax.jit(device_data.make_device_sampler(opt, "logo", meta))
    dev = tuple(jnp.asarray(a) for a in arrays)
    seen = set()
    for s in range(4):
        b = sample(dev, jax.random.PRNGKey(s))
        gt = np.asarray(b["raw_gt"]).astype(int)
        mk = np.asarray(b["raw_masked"]).astype(int)
        np.testing.assert_array_equal(mk, gt + 5)
        for i in range(gt.shape[0]):
            u = np.unique(gt[i])
            assert u.size == 1 and u[0] % 10 == 0 and 0 <= u[0] <= 50
            seen.add(int(u[0]) // 10)
    assert len(seen) > 2   # multiple pairs get sampled


def test_video_sampler_clip_semantics(coded_video_root):
    """Folded clips are predLen CONSECUTIVE frames of ONE video in
    frame-major channel order (datavid/donkey_folder.lua:138), variants
    honored (gt1Prob=0 -> only gt), mask crop well-formed."""
    opt = Opt(DATA_ROOT=coded_video_root, loadSize=0, predLen=3,
              gt1Prob=0.0,
              maskName=os.path.join(coded_video_root, "mask.png"),
              **{**TINY, "batchSize": 8})
    arrays, meta = device_data.load_corpus(opt, "video")
    assert arrays[0].shape == (2, 16, 140, 160, 3)   # 2 variants x 16 frames
    assert arrays[1].shape == (140, 160, 1)
    sample = jax.jit(device_data.make_device_sampler(opt, "video", meta))
    dev = tuple(jnp.asarray(a) for a in arrays)
    for s in range(3):
        b = sample(dev, jax.random.PRNGKey(s))
        raw = np.asarray(b["raw"])
        assert raw.shape == (8, opt.fineSize, opt.fineSize, 9)
        assert b["mask"].shape == (8, opt.fineSize, opt.fineSize, 1)
        assert set(np.unique(np.asarray(b["mask"]))) <= {0, 1}
        for i in range(raw.shape[0]):
            # frame-major fold: channels [3t:3t+3] are frame t (constant)
            fvals = []
            for t in range(3):
                u = np.unique(raw[i, :, :, 3 * t:3 * t + 3])
                assert u.size == 1
                fvals.append(int(u[0]))
            v = fvals[0] // 50
            assert v in (0, 1)
            base = fvals[0]
            assert fvals == [base, base + 1, base + 2]   # consecutive
            assert base % 50 + 2 < 8                      # inside the video


def test_video_sampler_gt1_variant(coded_video_root):
    """gt1Prob=1 draws ONLY the gt1 variant (coded +0 vs gt: same values —
    make them differ by reloading with distinct dirs).  The variant pick
    itself is pinned by cumprob order: probs (0,1) -> always index 1."""
    opt = Opt(DATA_ROOT=coded_video_root, loadSize=0, predLen=1,
              gt1Prob=1.0,
              maskName=os.path.join(coded_video_root, "mask.png"),
              **{**TINY, "batchSize": 4})
    arrays, meta = device_data.load_corpus(opt, "video")
    # poison variant 0 (gt): if the sampler ever picks it, values leak 255
    frames = np.asarray(arrays[0]).copy()
    frames[0] = 255
    sample = jax.jit(device_data.make_device_sampler(opt, "video", meta))
    dev = (jnp.asarray(frames), jnp.asarray(arrays[1]))
    for s in range(3):
        raw = np.asarray(sample(dev, jax.random.PRNGKey(s))["raw"])
        assert (raw < 255).all()


def test_dataDevice_e2e_and_deterministic_stream(video_root, tmp_path,
                                                 monkeypatch):
    """Full loop with dataDevice=1: trains, checkpoints, and two fresh runs
    with the same seed produce BIT-IDENTICAL final params (the batch
    stream is a pure function of seed+step — impossible for the threaded
    host loader, whose draws depend on worker scheduling)."""
    monkeypatch.chdir(tmp_path)
    opt = _opt(video_root, niter=2, ntrain=4)
    s1 = train(opt, "wholeim", quiet=True)
    assert int(s1.step) == 4
    assert glob.glob("checkpoints/train1_*_state.npz")
    s2 = train(opt.replace(name="again"), "wholeim", quiet=True)
    l1 = jax.tree.leaves(s1.params_g)
    l2 = jax.tree.leaves(s2.params_g)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("regime", ["center", "logo", "video", "video3d"])
def test_dataDevice_e2e_all_regimes(regime, video_root, class_image_root,
                                    paired_root, tmp_path, monkeypatch):
    """Every regime trains end-to-end with dataDevice=1."""
    monkeypatch.chdir(tmp_path)
    kw = dict(TINY, niter=2, ntrain=4, name=f"dd_{regime}")
    if regime == "center":
        opt = Opt(DATA_ROOT=class_image_root, loadSize=0, **kw)
    elif regime == "logo":
        dm, dg = paired_root
        opt = Opt(DATA_ROOT=dm, DATA_ROOT_GT=dg, loadSize=0, wtl2=0.999,
                  **kw)
    else:
        opt = Opt(DATA_ROOT=video_root, loadSize=0, predLen=2, wtl2=0.999,
                  maskName=os.path.join(video_root, "mask.png"), **kw)
    s = train(opt, regime, quiet=True)
    assert int(s.step) == 4
    for leaf in jax.tree.leaves(s.params_g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_dataDevice_withInit_e2e(video_root, tmp_path, monkeypatch):
    """withInit cascade + dataDevice: the initializer net consumes the
    device-synthesized batch (train_mycrit.lua:261-265 semantics)."""
    from video_filler_tpu.checkpoint import save_checkpoint
    from video_filler_tpu.train import init_train_state
    monkeypatch.chdir(tmp_path)
    opt = _opt(video_root, predLen=2, niter=1, ntrain=4, name="dd_wi")
    i_path = save_checkpoint(str(tmp_path), "i", 1,
                             init_train_state(jax.random.PRNGKey(9), opt,
                                              "video"))
    s = train(opt.replace(withInit=True, initName=i_path), "video",
              quiet=True)
    assert int(s.step) == 2


def test_dataDevice_guards(video_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit, match="deterministic loadSize"):
        train(_opt(video_root, loadSize=-1), "wholeim", quiet=True)
    with pytest.raises(SystemExit, match="display"):
        train(_opt(video_root, display=True), "wholeim", quiet=True)
    with pytest.raises(SystemExit, match="seqParallel"):
        train(_opt(video_root, predLen=2, seqParallel=2), "video3d",
              quiet=True)
