"""Temporal 3D-conv model family tests (the BASELINE north star's
"temporally-stacked 3D conv kernels").

Full-size (levels=5, 128²) compiles are prohibitively slow on XLA-CPU, so the
semantic tests run the same architecture at levels=3 (32² input) — the builder
is depth-parameterized; 128² is exercised on TPU (BASELINE.md records the
measured training throughput)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from video_filler_tpu.config import Opt
from video_filler_tpu.models import Video3DSpec, build_discriminator3d, build_generator3d
from video_filler_tpu.ops import layers3d
from video_filler_tpu.train import init_train_state, make_preprocess, make_train_step

TINY = dict(nef=8, ngf=8, ndf=8, nBottleneck=32, batchSize=2, fineSize=32,
            video3dLevels=3, computeDtype="float32")
SPEC = dict(nef=8, ngf=8, ndf=8, n_bottleneck=32, levels=3, dtype="float32")


def test_conv3d_matches_torch(rng):
    layer = layers3d.conv3d(3, 4, (3, 4, 4), (1, 2, 2), (1, 1, 1),
                            dtype=jnp.float32)
    p, s = layer.init(rng)
    x = np.random.RandomState(0).randn(2, 4, 8, 8, 3).astype(np.float32)
    y, _ = layer.apply(p, s, jnp.asarray(x))
    assert y.shape == (2, 4, 4, 4, 4)
    # torch Conv3d weight (out,in,kt,kh,kw) <- ours (kt,kh,kw,in,out)
    w = torch.from_numpy(np.asarray(p["w"]).transpose(4, 3, 0, 1, 2))
    ref = F.conv3d(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)), w,
                   stride=(1, 2, 2), padding=(1, 1, 1))
    np.testing.assert_allclose(np.asarray(y),
                               ref.numpy().transpose(0, 2, 3, 4, 1),
                               rtol=1e-4, atol=1e-4)


def test_conv3d_transpose_matches_torch(rng):
    layer = layers3d.conv3d_transpose(5, 3, (3, 4, 4), (1, 2, 2), (1, 1, 1),
                                      dtype=jnp.float32)
    p, s = layer.init(rng)
    x = np.random.RandomState(1).randn(2, 4, 4, 4, 5).astype(np.float32)
    y, _ = layer.apply(p, s, jnp.asarray(x))
    assert y.shape == (2, 4, 8, 8, 3)
    w = torch.from_numpy(np.asarray(p["w"]).transpose(3, 4, 0, 1, 2))
    ref = F.conv_transpose3d(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)), w,
                             stride=(1, 2, 2), padding=(1, 1, 1))
    np.testing.assert_allclose(np.asarray(y),
                               ref.numpy().transpose(0, 2, 3, 4, 1),
                               rtol=1e-4, atol=1e-4)


def test_fold_unfold_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 8, 8, 3)
                    .astype(np.float32))
    folded = layers3d.fold_time(x)
    assert folded.shape == (2, 8, 8, 12)
    np.testing.assert_array_equal(np.asarray(layers3d.unfold_time(folded, 4)),
                                  np.asarray(x))


def test_generator3d_shapes(rng):
    spec = Video3DSpec(nc=3, pred_len=4, **SPEC)
    assert spec.fine_size == 32
    gen = build_generator3d(spec)
    p, s = gen.init(rng)
    y, _ = gen.apply(p, s, jnp.zeros((1, 4, 32, 32, 3)), train=True)
    assert y.shape == (1, 4, 32, 32, 3)
    assert float(jnp.max(jnp.abs(y))) <= 1.0


def test_discriminator3d_shapes(rng):
    spec = Video3DSpec(nc=3, pred_len=4, **SPEC)
    disc = build_discriminator3d(spec)
    p, s = disc.init(rng)
    logits, _ = disc.apply(p, s, jnp.zeros((2, 4, 32, 32, 3)), train=True)
    assert logits.shape == (2,)
    # BN-free two-conv head (mirrors the 128-in 2D D)
    assert "bn0" not in p and "bn1" not in p and "bn2" in p


def test_generator3d_default_levels_structure(rng):
    """Full-depth spec builds the 128² ladder (checked structurally, not
    compiled: XLA-CPU conv3d compiles are too slow)."""
    spec = Video3DSpec(nc=3, pred_len=2, nef=8, ngf=8, n_bottleneck=16,
                       dtype="float32")
    assert spec.fine_size == 128
    p, _ = build_generator3d(spec).init(rng)
    assert p["enc"]["conv0"]["w"].shape == (3, 4, 4, 3, 8)
    assert p["enc"]["conv4"]["w"].shape == (3, 4, 4, 32, 64)   # 8x cap
    assert p["enc"]["conv5"]["w"].shape == (2, 4, 4, 64, 16)   # (T,4,4) valid
    assert p["dec"]["up0"]["w"].shape == (2, 4, 4, 16, 64)
    assert p["dec"]["up5"]["w"].shape == (3, 4, 4, 8, 3)


def test_video3d_train_step(rng):
    opt = Opt(wtl2=0.999, weight_nomask=0.05, predLen=2, wtgdl=0.1, **TINY)
    state = init_train_state(rng, opt, "video3d")
    step = jax.jit(make_train_step(opt, "video3d"))
    rs = np.random.RandomState(0)
    batch = {
        "real": jnp.asarray(rs.rand(2, 2, 32, 32, 3).astype(np.float32)
                            * 2 - 1),
        "mask": jnp.zeros((2, 1, 32, 32, 1)).at[:, :, 10:20, 10:20, :]
                   .set(1.0),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert float(metrics["errG_gdl"]) > 0


def test_video3d_preprocess(rng):
    opt = Opt(predLen=2, **TINY)
    pre = make_preprocess(opt, "video3d")
    rs = np.random.RandomState(0)
    host = {
        "raw": jnp.asarray(rs.randint(0, 256, (2, 50, 60, 6),
                                      dtype=np.uint8)),
        "mask": jnp.asarray(rs.randint(0, 2, (2, 50, 60, 1),
                                       dtype=np.uint8)),
    }
    out = pre(host, rng)
    assert out["real"].shape == (2, 2, 32, 32, 3)
    assert out["mask"].shape == (2, 1, 32, 32, 1)
    assert float(jnp.max(out["real"])) <= 1.0


def test_video3d_e2e_train(tmp_path, monkeypatch):
    from video_filler_tpu.data import synthetic
    from video_filler_tpu.train.loop import train

    monkeypatch.chdir(tmp_path)
    root = synthetic.make_video_corpus(str(tmp_path / "data"), n_videos=2,
                                       frames=6, h=60, w=80)
    mask = synthetic.make_mask_png(str(tmp_path / "mask.png"), h=60, w=80,
                                   box=(5, 8, 20, 30))
    opt = Opt(DATA_ROOT=root, loadSize=40, predLen=2, wtl2=0.999,
              weight_nomask=0.05, maskName=mask, nThreads=0, niter=1,
              ntrain=4, manualSeed=1, display=False, checkpointEvery=1,
              **TINY)
    state = train(opt, "video3d", quiet=True)
    assert int(state.step) == 2


def test_video3d_eval(tmp_path, monkeypatch):
    """run_test_vid works on the temporal regime end-to-end."""
    import os

    from video_filler_tpu.data import synthetic
    from video_filler_tpu.eval.video import run_test_vid
    from video_filler_tpu.train.loop import train

    monkeypatch.chdir(tmp_path)
    root = synthetic.make_video_corpus(str(tmp_path / "data"), n_videos=2,
                                       frames=6, h=60, w=80)
    mask = synthetic.make_mask_png(str(tmp_path / "mask.png"), h=60, w=80,
                                   box=(5, 8, 20, 30))
    opt = Opt(DATA_ROOT=root, loadSize=40, predLen=2, wtl2=0.999,
              maskName=mask, nThreads=0, niter=1, ntrain=4, manualSeed=1,
              display=False, checkpointEvery=1, name="v3", **TINY)
    train(opt, "video3d", quiet=True)
    out = run_test_vid(opt.replace(net="checkpoints/v3_1_state.npz"),
                       out_dir=str(tmp_path / "ev"), regime="video3d")
    assert out["fake"].shape == (4, 32, 32, 3)  # batch 2 x predLen 2 frames
    assert os.path.exists(tmp_path / "ev/pred_1.png")
