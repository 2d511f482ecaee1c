"""Eval-script tests: train a tiny checkpoint per regime, then run each eval
path end-to-end and check artifacts + semantics (paste-back, compositing,
vflip trick)."""

import os

import numpy as np
import pytest

from video_filler_tpu.config import Opt
from video_filler_tpu.data import synthetic
from video_filler_tpu.eval.demo import run_demo
from video_filler_tpu.eval.test_patch import run_test
from video_filler_tpu.eval.video import run_test_vid
from video_filler_tpu.eval.wholeim import run_wholeim
from video_filler_tpu.train.loop import train

TINY = dict(nef=8, ngf=8, ndf=8, nBottleneck=32, batchSize=2, nThreads=0,
            computeDtype="float32", niter=1, ntrain=4, manualSeed=222,
            display=False, checkpointEvery=1)


@pytest.fixture(scope="module")
def center_setup(tmp_path_factory):
    """Image folder + a 1-epoch center checkpoint."""
    old_cwd = os.getcwd()
    work = tmp_path_factory.mktemp("center")
    os.chdir(work)
    root = synthetic.make_image_folder(str(work / "data"), n=4, h=150, w=180)
    opt = Opt(DATA_ROOT=root, loadSize=140, wtl2=0.999, overlapPred=4,
              name="ce", **TINY)
    train(opt, "center", quiet=True)
    yield opt.replace(net="checkpoints/ce_1_state.npz"), str(work)
    os.chdir(old_cwd)  # don't leak a tmp cwd past this module


@pytest.fixture(scope="module")
def video_setup(tmp_path_factory):
    old_cwd = os.getcwd()
    work = tmp_path_factory.mktemp("video")
    os.chdir(work)
    root = synthetic.make_video_corpus(str(work / "data"), n_videos=2,
                                       frames=8, h=180, w=240)
    mask = synthetic.make_mask_png(str(work / "mask.png"), h=180, w=240)
    opt = Opt(DATA_ROOT=root, loadSize=150, predLen=2, wtl2=0.999,
              weight_nomask=0.05, maskName=mask, name="vid", **TINY)
    train(opt, "video", quiet=True)
    yield opt.replace(net="checkpoints/vid_1_state.npz"), str(work)
    os.chdir(old_cwd)


def test_demo(center_setup, tmp_path):
    opt, work = center_setup
    os.chdir(work)
    imdir = synthetic.make_image_folder(str(tmp_path / "demo"), n=3,
                                        h=128, w=128)
    out = run_demo(opt.replace(imDir=os.path.join(imdir, "images"),
                               batchSize=3),
                   out_path=str(tmp_path / "demo.png"))
    assert out["pred_center"].shape == (3, 64, 64, 3)
    assert out["inpainted"].shape == (3, 128, 128, 3)
    assert os.path.exists(tmp_path / "demo.png")
    # paste-back: outside the hole, inpainted == ctx exactly
    np.testing.assert_array_equal(out["inpainted"][:, :32], out["ctx"][:, :32])
    # overlapPred ring kept from ctx
    np.testing.assert_array_equal(out["inpainted"][:, 32:36, 64],
                                  out["ctx"][:, 32:36, 64])
    # interior came from the prediction
    assert not np.array_equal(out["inpainted"][:, 40:80, 40:80],
                              out["ctx"][:, 40:80, 40:80])


def test_test_patch(center_setup, tmp_path):
    opt, work = center_setup
    os.chdir(work)
    out = run_test(opt, out_prefix=str(tmp_path / "t"))
    assert os.path.exists(tmp_path / "t_inpainted.png")
    assert out["inpainted"].shape == (2, 128, 128, 3)


def test_test_vid(video_setup, tmp_path):
    opt, work = video_setup
    os.chdir(work)
    out = run_test_vid(opt, out_dir=str(tmp_path / "vid"))
    # predLen=2, batch=2 → 4 frames
    assert out["fake"].shape == (4, 128, 128, 3)
    assert os.path.exists(tmp_path / "vid/pred_1.png")
    assert os.path.exists(str(tmp_path / "vid") + "_result.gif")
    # composite: inside the mask, inpainted == the prediction; outside it
    # equals the context frames (which equal gt there) — not the prediction
    inp, fake, ctx = out["inpainted"], out["fake"], out["ctx"]
    outside = inp != fake                    # composite overrode G here
    assert outside.any(), "mask composite had no effect"
    np.testing.assert_array_equal(inp[outside], ctx[outside])


def test_wholeim_tiled(video_setup, tmp_path):
    opt, work = video_setup
    os.chdir(work)
    out = run_wholeim(opt.replace(loadSize=160),
                      out_dir=str(tmp_path / "whole"))
    t, h, w, c = out["pred"].shape
    assert t == opt.predLen and c == 3
    assert h % 128 == 0 and w % 128 == 0
    assert os.path.exists(tmp_path / "whole/inpaint_1.png")
    assert os.path.exists(str(tmp_path / "whole") + "_inpaint.gif")
    # outside the mask the composite equals the (padded) masked input
    pm = out["padmask"][None] > 0
    np.testing.assert_array_equal(np.where(pm, 0, out["inpaint"]),
                                  np.where(pm, 0, out["input"]))
    # orig = the UNPADDED mask-filled inputs: they match the padded input's
    # top-left region and have no -1 pad bands
    t_, ih, iw, _ = out["orig"].shape
    assert ih <= out["input"].shape[1] and iw <= out["input"].shape[2]
    np.testing.assert_array_equal(out["orig"],
                                  out["input"][:, :ih, :iw])
    # inside the mask it equals the prediction
    np.testing.assert_array_equal(np.where(pm, out["inpaint"], 0),
                                  np.where(pm, out["pred"], 0))


def test_metrics_harness(video_setup, tmp_path):
    from video_filler_tpu.eval.metrics import bench_inference, evaluate, write_report

    opt, work = video_setup
    os.chdir(work)
    q = evaluate(opt, "video", n_batches=2)
    assert 0 <= q["l2"] < 4.0 and q["psnr_db"] > 0
    assert q["hole_l2"] >= 0
    s = bench_inference(opt, "video", iters=2)
    assert s["frames_per_sec"] > 0
    assert s["frames_per_sec"] == pytest.approx(
        s["clips_per_sec"] * opt.predLen)
    out = tmp_path / "m.md"
    write_report(str(out), "video", q, s)
    text = out.read_text()
    assert "PSNR" in text and "frames/s" in text


def test_stream_whole_video(video_setup, tmp_path):
    """Streaming inference walks consecutive windows and writes a continuous
    inpainted sequence."""
    from video_filler_tpu.eval.stream import run_stream

    opt, work = video_setup
    os.chdir(work)
    out = run_stream(opt.replace(loadSize=160), video=0, start_frame=1,
                     num_frames=6, out_dir=str(tmp_path / "st"))
    assert out["frames"].shape[0] == 6  # bounded head buffer (≤64 frames)
    assert out["n_frames"] == 6
    assert out["fps"] > 0
    for i in (1, 6):
        assert os.path.exists(tmp_path / f"st/inpaint_{i:05d}.png")
    assert os.path.exists(str(tmp_path / "st") + "_inpaint.gif")


def test_load_generator_returns_device_arrays(tmp_path, rng):
    """restore_subtree yields host-numpy trees; load_generator must commit
    them to device ONCE — numpy args make jit re-upload the full generator
    on every call (serving/bench would measure weight transfer)."""
    import jax

    from video_filler_tpu.checkpoint import save_checkpoint
    from video_filler_tpu.eval.common import load_generator
    from video_filler_tpu.train import init_train_state

    opt = Opt(nef=8, ngf=8, ndf=8, nBottleneck=32, batchSize=2,
              computeDtype="float32")
    state = init_train_state(rng, opt, "center")
    p = save_checkpoint(str(tmp_path), "dev", 1, state)
    _, params, bn_state = load_generator(opt, "center", p)
    for leaf in jax.tree.leaves(params) + jax.tree.leaves(bn_state):
        assert isinstance(leaf, jax.Array), type(leaf)


def test_live_generator_matches_saved(tmp_path, rng):
    """live_generator (device-resident TrainState, zero checkpoint fetch)
    is bit-identical to the save -> load_generator round trip — the
    guarantee that lets big-model ledgers (wholeim soak) skip the
    multi-GB device_get that hung the axon tunnel (CLAUDE.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_filler_tpu.checkpoint import save_checkpoint
    from video_filler_tpu.eval.common import live_generator, load_generator
    from video_filler_tpu.train import init_train_state

    opt = Opt(nef=8, ngf=8, ndf=8, nBottleneck=32, batchSize=2,
              computeDtype="bfloat16")
    state = init_train_state(rng, opt, "center")
    fwd_live, p_live, bn_live = live_generator(opt, "center", state)
    path = save_checkpoint(str(tmp_path), "live", 1, state)
    fwd_ck, p_ck, bn_ck = load_generator(opt, "center", path)
    x = jnp.asarray(np.random.RandomState(0)
                    .uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32))
    # bf16 residency (load path) vs f32-resident + in-jit cast (live path)
    # must agree bit-for-bit — the cast happens before any arithmetic.
    np.testing.assert_array_equal(np.asarray(fwd_live(p_live, bn_live, x)),
                                  np.asarray(fwd_ck(p_ck, bn_ck, x)))


def test_export_stablehlo_roundtrip(tmp_path, rng):
    """jax.export deployment artifact: the serialized generator (weights
    baked in, uint8 boundary) deserializes and reproduces the live forward
    bit-exactly; cross-platform lowering produces a tpu+cpu artifact from
    this CPU host."""
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from video_filler_tpu.checkpoint import save_checkpoint
    from video_filler_tpu.eval.common import load_generator
    from video_filler_tpu.eval.export_hlo import export_generator_hlo
    from video_filler_tpu.ops import image as image_ops
    from video_filler_tpu.train import init_train_state

    opt = Opt(predLen=2, batchSize=2, nef=8, ngf=8, ndf=8, nBottleneck=32,
              computeDtype="float32")
    state = init_train_state(rng, opt, "video")
    net = save_checkpoint(str(tmp_path), "hlo", 1, state)

    blob = export_generator_hlo(opt, "video", net, platforms=("cpu",))
    g = jax_export.deserialize(blob)
    rs = np.random.RandomState(0)
    ctx = rs.randint(0, 256, (2, 128, 128, 6), np.uint8)
    out = np.asarray(g.call(jnp.asarray(ctx)))

    fwd, params, bn = load_generator(opt, "video", net)
    ref = np.asarray(image_ops.denormalize_to_uint8(
        fwd(params, bn, image_ops.normalize_uint8(jnp.asarray(ctx)))
        .astype(jnp.float32)))
    np.testing.assert_array_equal(out, ref)

    multi = jax_export.deserialize(
        export_generator_hlo(opt, "video", net, platforms=("tpu", "cpu")))
    assert multi.platforms == ("tpu", "cpu")


def test_export_stablehlo_video3d_and_noisegen(tmp_path, rng):
    """The two served generator shapes beyond the plain 2D forward also
    export: video3d over the channel-folded wire format (serve.py), and
    noiseGen artifacts taking a second (B,1,1,nz) noise input — each
    bit-equal to the live forward."""
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from video_filler_tpu.checkpoint import save_checkpoint
    from video_filler_tpu.eval.common import load_generator
    from video_filler_tpu.eval.export_hlo import export_generator_hlo
    from video_filler_tpu.ops import image as image_ops
    from video_filler_tpu.ops.layers3d import fold_time, unfold_time
    from video_filler_tpu.train import init_train_state

    rs = np.random.RandomState(0)

    # video3d: folded clips in/out
    opt3 = Opt(predLen=4, video3dLevels=3, fineSize=32, batchSize=2, nef=8,
               ngf=8, ndf=8, nBottleneck=32, computeDtype="float32")
    st3 = init_train_state(rng, opt3, "video3d")
    net3 = save_checkpoint(str(tmp_path), "h3d", 1, st3)
    g3 = jax_export.deserialize(
        export_generator_hlo(opt3, "video3d", net3, platforms=("cpu",)))
    ctx3 = rs.randint(0, 256, (2, 32, 32, 12), np.uint8)
    out3 = np.asarray(g3.call(jnp.asarray(ctx3)))
    fwd3, p3, bn3 = load_generator(opt3, "video3d", net3)
    want3 = np.asarray(image_ops.denormalize_to_uint8(fold_time(
        fwd3(p3, bn3, unfold_time(
            image_ops.normalize_uint8(jnp.asarray(ctx3)), 4))
    ).astype(jnp.float32)))
    np.testing.assert_array_equal(out3, want3)

    # noiseGen: (ctx, noise) two-input artifact
    optn = Opt(batchSize=2, overlapPred=4, noiseGen=True, nz=16, nef=8,
               ngf=8, ndf=8, nBottleneck=32, computeDtype="float32")
    stn = init_train_state(rng, optn, "center")
    netn = save_checkpoint(str(tmp_path), "hng", 1, stn)
    gn = jax_export.deserialize(
        export_generator_hlo(optn, "center", netn, platforms=("cpu",)))
    ctxn = rs.randint(0, 256, (2, 128, 128, 3), np.uint8)
    z = rs.randn(2, 1, 1, 16).astype(np.float32)
    outn = np.asarray(gn.call(jnp.asarray(ctxn), jnp.asarray(z)))
    fwdn, pn, bnn = load_generator(optn, "center", netn)
    wantn = np.asarray(image_ops.denormalize_to_uint8(
        fwdn(pn, bnn, (image_ops.normalize_uint8(jnp.asarray(ctxn)),
                       jnp.asarray(z))).astype(jnp.float32)))
    np.testing.assert_array_equal(outn, wantn)
    # noise reaches the artifact's compute: different z, different output
    z2 = rs.randn(2, 1, 1, 16).astype(np.float32)
    assert not np.array_equal(
        np.asarray(gn.call(jnp.asarray(ctxn), jnp.asarray(z2))), outn)


def test_evaluate_noisegen(tmp_path):
    """noiseGen generators take x=(ctx, z): the scoring/bench harness must
    feed the bottleneck join its noise leg (regression: the round-5
    noisegen16 ledger trained 120 epochs on-chip then crashed in
    evaluate() at the unpack in the generator apply)."""
    from video_filler_tpu.eval.metrics import bench_inference, evaluate

    old_cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        root = synthetic.make_image_folder(str(tmp_path / "data"), n=4,
                                           h=150, w=180)
        opt = Opt(DATA_ROOT=root, loadSize=140, wtl2=0.999, overlapPred=4,
                  noiseGen=True, nz=16, name="ngt", **TINY)
        train(opt, "center", quiet=True)
        opt = opt.replace(net="checkpoints/ngt_1_state.npz")
        q = evaluate(opt, "center", n_batches=2)
        assert np.isfinite(q["psnr_db"]) and q["hole_l2"] > 0
        s = bench_inference(opt, "center", iters=2)
        assert s["clips_per_sec"] > 0
    finally:
        os.chdir(old_cwd)
