"""Device-resident dataset cache (data/device_data.py, ``dataDevice=1``).

The in-jit batch synthesis must reproduce the host wholeim sampler's
transform EXACTLY (same donkey_wholeim.lua:141-216 semantics given the
same explicit draws — pinned against a numpy replica here), produce
host-batch-shaped uint8 dicts, make the batch stream a deterministic
function of (seed, step), and train end-to-end through the real loop."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_filler_tpu.config import Opt
from video_filler_tpu.data import device_data, synthetic
from video_filler_tpu.train.loop import train

TINY = dict(nef=8, ngf=8, ndf=8, nBottleneck=32, batchSize=2, nThreads=0,
            computeDtype="float32", niter=1, ntrain=8, manualSeed=222,
            display=False, checkpointEvery=1, dataDevice=True)


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vids"))
    synthetic.make_video_corpus(root, n_videos=2, frames=8, h=180, w=240)
    synthetic.make_mask_png(os.path.join(root, "mask.png"), h=180, w=240)
    return root


def _opt(video_root, **kw):
    return Opt(DATA_ROOT=video_root, loadSize=0, wtl2=0.999,
               maskName=os.path.join(video_root, "mask.png"),
               **{**TINY, **kw})


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
    fd, md = jnp.asarray(frames), jnp.asarray(mask3)
    b1 = sample(fd, md, jax.random.PRNGKey(7))
    nc, fs = opt.nc, opt.fineSize
    assert b1["raw_masked"].shape == (4, fs, fs, nc * 9)
    assert b1["raw_real"].shape == (4, fs, fs, nc * 4)
    assert b1["mask"].shape == (4, fs, fs, nc * 4)
    assert all(v.dtype == jnp.uint8 for v in b1.values())
    # the masked input really is mask-filled: where the (untranslated-
    # corner) mask is 1 in the first patch, the fill value must appear
    fill = int(round(opt.maskValue * 255.0))
    b2 = sample(fd, md, jax.random.PRNGKey(7))
    for k in b1:
        np.testing.assert_array_equal(np.asarray(b1[k]), np.asarray(b2[k]))
    b3 = sample(fd, md, jax.random.PRNGKey(8))
    assert any(not np.array_equal(np.asarray(b1[k]), np.asarray(b3[k]))
               for k in b1)
    # fill value occurs in masked patches (the mask region is nonempty)
    assert (np.asarray(b1["raw_masked"]) == fill).any()


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


def test_dataDevice_guards(video_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit, match="supports regimes"):
        train(_opt(video_root), "video", quiet=True)
    with pytest.raises(SystemExit, match="display"):
        train(_opt(video_root, display=True), "wholeim", quiet=True)
