"""End-to-end seeded smoke trains through the real loop: synthetic folder ->
threaded loader -> device preprocess -> fused step -> checkpoint, per regime."""

import glob
import os

import jax
import numpy as np
import pytest

from video_filler_tpu.config import Opt
from video_filler_tpu.data import synthetic
from video_filler_tpu.train.loop import train

TINY = dict(nef=8, ngf=8, ndf=8, nBottleneck=32, batchSize=2, nThreads=2,
            computeDtype="float32", niter=1, ntrain=8, manualSeed=222,
            display=False, checkpointEvery=1)


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    return synthetic.make_image_folder(str(tmp_path_factory.mktemp("imgs")),
                                       n=6)


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vids"))
    synthetic.make_video_corpus(root, n_videos=2, frames=8)
    synthetic.make_mask_png(os.path.join(root, "mask.png"))
    return root


def test_center_e2e(image_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    opt = Opt(DATA_ROOT=image_root, loadSize=140, wtl2=0.999, **TINY)
    state = train(opt, "center", quiet=True)
    # min(dataset=6, ntrain=8) // batch 2 = 3 steps (train.lua:418 semantics)
    assert int(state.step) == 3
    assert glob.glob("checkpoints/train1_1_state.npz")
    assert os.path.exists("logs/train1.jsonl")


def test_video_e2e_with_resume(video_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    opt = Opt(DATA_ROOT=video_root, loadSize=150, predLen=2, wtl2=0.999,
              weight_nomask=0.05, maskName=os.path.join(video_root, "mask.png"),
              **TINY)
    state = train(opt, "video", quiet=True)
    assert int(state.step) == 4
    # finetune resume (loadName/loadIter path)
    opt2 = opt.replace(loadName="train1", loadIter=1, niter=2)
    state2 = train(opt2, "video", quiet=True)
    assert int(state2.step) == 8


def test_logo_e2e(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    masked_root, gt_root = synthetic.make_paired_folders(str(tmp_path / "d"),
                                                         n=6)
    opt = Opt(DATA_ROOT=masked_root, DATA_ROOT_GT=gt_root, loadSize=140,
              wtl2=0.999, **TINY)
    state = train(opt, "logo", quiet=True)
    assert int(state.step) == 3  # min(6, 8) // 2


def test_wholeim_e2e(video_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    opt = Opt(DATA_ROOT=video_root, loadSize=256, wtl2=0.999,
              maskName=os.path.join(video_root, "mask.png"), **TINY)
    state = train(opt, "wholeim", quiet=True)
    assert int(state.step) == 4


def test_ledger_save_free_mode(image_root, tmp_path, monkeypatch):
    """run_ledger(save=False) scores init+final device-resident and writes
    ZERO checkpoints — the tunnel-safe protocol for models whose TrainState
    is too large to device_get (wholeim soak, CLAUDE.md)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from ledger_common import run_ledger

    monkeypatch.chdir(tmp_path)
    opt = Opt(DATA_ROOT=image_root, loadSize=140, wtl2=0.999,
              **{**TINY, "checkpointEvery": 9999, "name": "nosave"})
    rows = []
    run_ledger(opt, "center", ("train",), rows, mid_tag="mid",
               final_tag="final", max_steps=2, n_batches=1, save=False)
    # The final row's tag is DERIVED from the actual step reached (the
    # round-5 step-label fix): a hand-computed final_tag that disagrees
    # is corrected, so curves can never carry mislabeled x-coordinates.
    assert [r["ckpt"] for r in rows] == ["init", "step2"]
    assert all(np.isfinite(r["l2"]) for r in rows)
    assert not glob.glob("checkpoints/nosave*")


def test_ledger_periodic_scoring_flushes(image_root, tmp_path, monkeypatch):
    """save=False + score_every: in-loop device-resident rows land at epoch
    boundaries and `flush` persists after EVERY row — a tunnel flap killing
    the soak mid-run keeps the curve up to the last scoring point."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from ledger_common import run_ledger

    monkeypatch.chdir(tmp_path)
    opt = Opt(DATA_ROOT=image_root, loadSize=140, wtl2=0.999,
              **{**TINY, "checkpointEvery": 9999, "niter": 2,
                 "name": "nosave2"})
    rows, flushed = [], []
    run_ledger(opt, "center", ("train",), rows, mid_tag="mid",
               final_tag="final", max_steps=6, n_batches=1, save=False,
               score_every=1, flush=lambda: flushed.append(len(rows)))
    # 3 steps/epoch; max_steps=6 stops inside epoch 2 before its boundary,
    # so exactly one periodic row (epoch 1 = global step 3) lands.  The
    # final row's tag is derived from the actual step reached (step-label
    # fix), overriding the hand-computed "final".
    assert [r["ckpt"] for r in rows] == ["init", "step3", "step6"]
    assert flushed == [1, 2, 3]  # flush ran after every row
    assert all(np.isfinite(r["l2"]) for r in rows)
    assert not glob.glob("checkpoints/nosave2*")


def test_epoch_hook_sees_live_state(image_root, tmp_path, monkeypatch):
    """train(epoch_hook=) fires at every completed epoch boundary with the
    live device-resident TrainState (readable params, correct step count)."""
    monkeypatch.chdir(tmp_path)
    opt = Opt(DATA_ROOT=image_root, loadSize=140, wtl2=0.999,
              **{**TINY, "niter": 2, "checkpointEvery": 9999,
                 "name": "hooked"})
    seen = []
    train(opt, "center", quiet=True,
          epoch_hook=lambda epoch, st: seen.append(
              (epoch, int(st.step),
               bool(np.all(np.isfinite(jax.device_get(
                   jax.tree.leaves(st.params_g)[0])))))))
    assert seen == [(1, 3, True), (2, 6, True)]


def test_in_train_eval_records(image_root, tmp_path, monkeypatch):
    """Opt.evalEvery: the live generator is scored mid-training every N
    epochs (here every 2nd of 4 epochs) and eval records (keyed
    `eval_epoch`) land in the run's JSONL with finite metrics, alongside
    the step/epoch records."""
    import json as _json

    monkeypatch.chdir(tmp_path)
    opt = Opt(DATA_ROOT=image_root, loadSize=140, wtl2=0.999, split=80,
              **{**TINY, "niter": 4, "evalEvery": 2, "evalBatches": 1,
                 "evalSplit": "test", "checkpointEvery": 9999,
                 "name": "ev"})
    train(opt, "center", quiet=True)
    recs = [_json.loads(ln) for ln in open("logs/ev.jsonl")]
    evals = [r for r in recs if "eval_epoch" in r]
    assert [e["eval_epoch"] for e in evals] == [2, 4]
    assert all(e["split"] == "test" for e in evals)
    assert all(np.isfinite(e["psnr_db"]) and np.isfinite(e["hole_l2"])
               for e in evals)
    assert any("epoch" in r for r in recs)  # step records still present


def test_keep_best_banks_the_peak(image_root, tmp_path, monkeypatch):
    """Opt.keepBest: each improving in-train eval writes a G+BN-only
    {name}_best_state.npz whose meta records the banked metric; the file
    is loadable by the normal eval path and is exempt from
    keepCheckpoints retention (non-numeric epoch tag)."""
    import json as _json

    monkeypatch.chdir(tmp_path)
    opt = Opt(DATA_ROOT=image_root, loadSize=140, wtl2=0.999, split=80,
              **{**TINY, "niter": 4, "evalEvery": 1, "evalBatches": 1,
                 "evalSplit": "test", "keepBest": True,
                 "keepCheckpoints": 1, "checkpointEvery": 1,
                 "name": "kb"})
    state = train(opt, "center", quiet=True)
    spe = int(state.step) // 4  # actual (clamped) steps/epoch over 4 epochs

    best = "checkpoints/kb_best_state.npz"
    assert os.path.exists(best)
    # Retention pruned the numbered checkpoints (prune-before-save keeps
    # the newest `keep` PLUS the incoming save) but never the best file.
    files = sorted(glob.glob("checkpoints/kb_*_state.npz"))
    assert files == ["checkpoints/kb_3_state.npz",
                     "checkpoints/kb_4_state.npz", best]

    # The banked value IS the minimum over the eval events (lower-better
    # hole_l2 default), and meta points at the epoch that achieved it.
    with np.load(best, allow_pickle=False) as data:
        meta = _json.loads(str(data["__meta__"]))
        keys = set(data.files)
    evals = [_json.loads(ln) for ln in open("logs/kb.jsonl")
             if "eval_epoch" in ln]
    by_epoch = {e["eval_epoch"]: e["hole_l2"] for e in evals}
    # (JSONL rounds metric floats; meta keeps full precision.)
    assert abs(meta["hole_l2"] - min(by_epoch.values())) < 1e-5
    assert abs(by_epoch[meta["epoch"]] - meta["hole_l2"]) < 1e-5
    assert meta["step"] == meta["epoch"] * spe
    # G+BN only: no discriminator, no optimizer moments in the payload.
    assert any(k.startswith(".params_g") for k in keys)
    assert any(k.startswith(".state_g") for k in keys)
    assert not any(k.startswith((".params_d", ".opt_g", ".opt_d"))
                   for k in keys)

    # The normal eval path consumes it like any checkpoint.
    from video_filler_tpu.eval.metrics import evaluate
    m = evaluate(opt.replace(net=best, evalSplit="test"), "center",
                 n_batches=1)
    assert np.isfinite(m["hole_l2"])
    assert abs(float(m["hole_l2"]) - meta["hole_l2"]) < 5e-4


def test_keep_best_seeds_from_existing_best_file(image_root, tmp_path,
                                                 monkeypatch):
    """A pre-existing {name}_best_state.npz seeds best-so-far, so a
    resumed/continued run's first eval can never overwrite a better
    pre-kill peak with a worse value — and a worse seed is still beaten."""
    import json as _json

    def _rewrite_meta(path, **updates):
        with np.load(path, allow_pickle=False) as d:
            arrs = {k: d[k] for k in d.files}
        meta = _json.loads(str(arrs["__meta__"]))
        meta.update(updates)
        arrs["__meta__"] = np.array(_json.dumps(meta))
        np.savez(path, **arrs)

    def _meta(path):
        with np.load(path, allow_pickle=False) as d:
            return _json.loads(str(d["__meta__"]))

    monkeypatch.chdir(tmp_path)
    opt = Opt(DATA_ROOT=image_root, loadSize=140, wtl2=0.999, split=80,
              **{**TINY, "niter": 1, "evalEvery": 1, "evalBatches": 1,
                 "evalSplit": "test", "keepBest": True, "name": "kbr",
                 "checkpointEvery": 99})
    best = "checkpoints/kbr_best_state.npz"
    train(opt, "center", quiet=True)
    assert os.path.exists(best)

    # Unbeatable existing peak (hole_l2=0 is perfect): the next run's eval
    # must NOT re-bank.
    _rewrite_meta(best, hole_l2=0.0, epoch=-1)
    train(opt, "center", quiet=True)
    assert _meta(best)["hole_l2"] == 0.0 and _meta(best)["epoch"] == -1

    # Hopeless existing peak: the next run's first eval re-banks over it.
    _rewrite_meta(best, hole_l2=1e9, epoch=-1)
    train(opt, "center", quiet=True)
    m = _meta(best)
    assert m["hole_l2"] < 1.0 and m["epoch"] == 1

    # A best file banked under a DIFFERENT metric carries no comparable
    # value: it is ignored (first eval re-banks under the new metric).
    _rewrite_meta(best, hole_l2=0.0, epoch=-1)
    train(opt.replace(bestMetric="psnr_db"), "center", quiet=True)
    m = _meta(best)
    assert "psnr_db" in m and m["epoch"] == 1


def test_keep_best_config_preflight(image_root, tmp_path, monkeypatch):
    """keepBest without evalEvery, or with an unknown bestMetric, aborts
    at startup before any resources exist."""
    monkeypatch.chdir(tmp_path)
    base = Opt(DATA_ROOT=image_root, loadSize=140, wtl2=0.999, split=80,
               **{**TINY, "name": "kbbad"})
    with pytest.raises(SystemExit, match="keepBest=1 needs evalEvery"):
        train(base.replace(keepBest=True), "center", quiet=True)
    with pytest.raises(SystemExit, match="bestMetric"):
        train(base.replace(keepBest=True, evalEvery=1,
                           bestMetric="sharpness"), "center", quiet=True)


def test_in_train_eval_preflight_fails_loud(image_root, tmp_path,
                                            monkeypatch):
    """evalEvery + evalSplit=test without split<100 must abort at STARTUP
    (empty held-out portion), not 30 minutes in at the first eval event."""
    monkeypatch.chdir(tmp_path)
    opt = Opt(DATA_ROOT=image_root, loadSize=140, wtl2=0.999,
              **{**TINY, "evalEvery": 1, "evalSplit": "test",
                 "name": "evbad"})
    with pytest.raises(SystemExit, match="empty dataset portion"):
        train(opt, "center", quiet=True)


def test_display_grids_written(image_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    opt = Opt(DATA_ROOT=image_root, loadSize=140, wtl2=0.999,
              **{**TINY, "display": True, "display_iter": 2})
    train(opt, "center", quiet=True)
    assert glob.glob("display/train1_*_fake.png")
    assert glob.glob("display/train1_*_inpaint.png")


def test_auto_resume(video_root, tmp_path, monkeypatch):
    """Crash recovery: rerunning with autoResume continues from the latest
    checkpoint instead of restarting."""
    monkeypatch.chdir(tmp_path)
    opt = Opt(DATA_ROOT=video_root, loadSize=150, predLen=1, wtl2=0.999,
              maskName=os.path.join(video_root, "mask.png"), **TINY)
    train(opt, "video", quiet=True)           # epoch 1 checkpointed
    state = train(opt.replace(autoResume=True, niter=2), "video", quiet=True)
    assert int(state.step) == 8               # 4 steps epoch1 + 4 steps epoch2


def test_reference_mask_assets_load():
    """The shipped mask*.png assets binarize like the reference donkeys."""
    import glob as g

    from video_filler_tpu.data.pipeline import load_mask

    masks = sorted(g.glob("/root/repo/assets/masks/mask*.png"))
    assert len(masks) == 7
    for p in masks:
        m = load_mask(p, "byte")
        assert m.ndim == 3 and m.shape[-1] == 1
        assert set(np.unique(m)) <= {0, 1}
        assert m.sum() > 0, f"{p} has no mask pixels after byte binarization"


def test_deterministic_training(video_root, tmp_path, monkeypatch):
    """Same manualSeed + synchronous loader => bit-identical checkpoints
    (the reproducibility story the reference only approximates with
    manualSeed + per-donkey seeds, SURVEY §4)."""
    monkeypatch.chdir(tmp_path)
    opt = Opt(DATA_ROOT=video_root, loadSize=150, predLen=1, wtl2=0.999,
              maskName=os.path.join(video_root, "mask.png"),
              **{**TINY, "nThreads": 0})
    s1 = train(opt.replace(name="detA"), "video", quiet=True)
    s2 = train(opt.replace(name="detB"), "video", quiet=True)
    for a, b in zip(jax.tree.leaves(s1.params_g), jax.tree.leaves(s2.params_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(s1.state_g), jax.tree.leaves(s2.state_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_video3d_sequence_parallel_e2e(video_root, tmp_path, monkeypatch):
    """The full training loop in SP mode: video3d clips T-sharded over a
    ('data','seq') mesh via seqParallel (halo-exchange temporal convs through
    the real loop, not just the step)."""
    monkeypatch.chdir(tmp_path)
    opt = Opt(DATA_ROOT=video_root, loadSize=40, fineSize=32,
              video3dLevels=3, predLen=4, wtl2=0.999, weight_nomask=0.05,
              maskName=os.path.join(video_root, "mask.png"),
              dataParallel=4, seqParallel=2,
              **{**TINY, "batchSize": 4, "nBottleneck": 16})
    state = train(opt, "video3d", quiet=True)
    assert int(state.step) == 2  # min(16 clips, ntrain 8) // batch 4
    assert glob.glob("checkpoints/train1_1_state.npz")

    # misconfigurations fail loudly
    import pytest
    with pytest.raises(SystemExit, match="video3d"):
        train(opt.replace(), "video", quiet=True)
    with pytest.raises(SystemExit, match="divide"):
        train(opt.replace(predLen=3), "video3d", quiet=True)


def test_halt_on_nonfinite_loss(image_root, tmp_path, monkeypatch):
    """Divergence detection: a NaN loss halts with a clear error (instead of
    silently training on NaNs); haltOnNonFinite=0 pushes through."""
    import jax.numpy as jnp

    import video_filler_tpu.train.loop as loop_mod
    from video_filler_tpu.train.step import make_train_step as real_mts

    def poisoned_mts(opt, regime, with_init=False, sp_mesh=None):
        step = real_mts(opt, regime, with_init=with_init, sp_mesh=sp_mesh)

        def bad_step(state, batch, key, *a):
            new_state, metrics = step(state, batch, key, *a)
            metrics["errD"] = metrics["errD"] * jnp.float32(np.nan)
            return new_state, metrics
        return bad_step

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(loop_mod, "make_train_step", poisoned_mts)
    opt = Opt(DATA_ROOT=image_root, loadSize=140, wtl2=0.999, **TINY)
    with pytest.raises(RuntimeError, match="diverged"):
        train(opt, "center", quiet=True)
    # opt-out still completes
    state = train(opt.replace(haltOnNonFinite=False, name="nf_off"),
                  "center", quiet=True)
    assert int(state.step) == 3


def test_dashboard_serves_metrics_and_grids(tmp_path, monkeypatch):
    """displayServer parity (`display` rock): /, /metrics, /imgs, /img/<f>."""
    import json as _json
    import urllib.request

    from video_filler_tpu.utils import Dashboard, save_png

    monkeypatch.chdir(tmp_path)
    os.makedirs("logs"), os.makedirs("display")
    with open("logs/dash.jsonl", "w") as f:
        for i in range(5):
            f.write(_json.dumps({"epoch": 1, "step": i, "errD": 1.0 - 0.1 * i,
                                 "errG": 0.5, "errG_l2": 0.2}) + "\n")
    save_png("display/dash_e1_s1_fake.png",
             np.zeros((8, 8, 3), np.float32))
    d = Dashboard("dash", port=0)  # ephemeral port
    try:
        base = f"http://localhost:{d.port}"
        html = urllib.request.urlopen(f"{base}/", timeout=10).read().decode()
        assert "dash" in html and "canvas" in html
        ms = _json.loads(urllib.request.urlopen(
            f"{base}/metrics?n=3", timeout=10).read())
        assert len(ms) == 3 and ms[-1]["step"] == 4
        imgs = _json.loads(urllib.request.urlopen(f"{base}/imgs", timeout=10).read())
        assert imgs == ["dash_e1_s1_fake.png"]
        png = urllib.request.urlopen(f"{base}/img/{imgs[0]}", timeout=10).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        # malformed n= must 400, not crash the handler with no response
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{base}/metrics?n=abc", timeout=10)
        assert e.value.code == 400
    finally:
        d.close()


def test_dashboard_tail_read_long_lines(tmp_path, monkeypatch):
    """Tail-seek must return the requested n records even when JSONL lines
    far exceed the initial window's per-line byte estimate."""
    import json as _json

    from video_filler_tpu.utils import Dashboard

    monkeypatch.chdir(tmp_path)
    os.makedirs("logs")
    pad = "x" * 700  # ~720-byte lines vs the 256-byte seek estimate
    with open("logs/longdash.jsonl", "w") as f:
        for i in range(450):
            f.write(_json.dumps({"step": i, "errD": 1.0, "note": pad}) + "\n")
    d = Dashboard("longdash", port=0)
    try:
        ms = d.read_metrics(400)
        assert len(ms) == 400 and ms[0]["step"] == 50 and ms[-1]["step"] == 449
        assert d.read_metrics(1000) and len(d.read_metrics(1000)) == 450
    finally:
        d.close()


def test_sigterm_preemption_checkpoint(image_root, tmp_path, monkeypatch):
    """Preemption-aware shutdown (TPU maintenance events deliver SIGTERM):
    the loop finishes the in-flight step, writes a synchronous checkpoint
    labeled with the interrupted epoch, and exits cleanly; autoResume then
    continues from it.  Run as a real CLI subprocess — the handler installs
    only on the main thread of a single-process run."""
    import select
    import signal
    import subprocess
    import sys
    import time

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"  # PYTHONPATH is safe on the cpu backend
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    args = [sys.executable, "-u", "-m", "video_filler_tpu.train",
            "regime=center", f"DATA_ROOT={image_root}", "loadSize=140",
            "wtl2=0.999", "nef=8", "ngf=8", "ndf=8", "nBottleneck=32",
            "batchSize=2", "nThreads=0", "computeDtype=float32",
            "niter=10000", "ntrain=8", "manualSeed=222", "display=0",
            "checkpointEvery=100000", "name=pre"]
    proc = subprocess.Popen(args, cwd=str(tmp_path), env=env,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    try:
        # wait until training demonstrably steps, then deliver SIGTERM
        lines = []
        deadline = time.time() + 300
        while time.time() < deadline:
            # select bounds the blocking readline so a wedged-but-silent
            # child can't hang the test past its own deadline
            ready, _, _ = select.select([proc.stdout], [], [], 1.0)
            if not ready:
                continue
            line = proc.stdout.readline()
            if line == "":  # EOF: the child died before stepping
                raise AssertionError(
                    "trainer exited early (rc=%s):\n%s"
                    % (proc.poll(), "".join(lines)[-2000:]))
            lines.append(line)
            if "Epoch: [3]" in line:
                break
        else:
            raise AssertionError("no step output:\n" + "".join(lines)[-2000:])
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out[-2000:]
    assert "SIGTERM: checkpointed" in out, out[-2000:]
    ckpts = glob.glob(str(tmp_path / "checkpoints" / "pre_*_state.npz"))
    assert ckpts, "no preemption checkpoint written"

    # resume continues cleanly from the preemption checkpoint
    monkeypatch.chdir(tmp_path)
    opt = Opt(DATA_ROOT=image_root, loadSize=140, wtl2=0.999, nef=8,
              ngf=8, ndf=8, nBottleneck=32, batchSize=2, nThreads=0,
              computeDtype="float32", ntrain=8, manualSeed=222,
              display=False, checkpointEvery=100000, name="pre",
              autoResume=True, niter=100000)
    state = train(opt, "center", max_steps=2, quiet=True)
    assert int(state.step) >= 2


def test_preemption_save_respects_retention(image_root, tmp_path,
                                            monkeypatch):
    """The SIGTERM preemption checkpoint applies the same keepCheckpoints
    pruning as the epoch-boundary path: repeated preemptions must not
    accumulate checkpoints past the configured retention (round-3 advisor
    finding; loop.py preemption branch).  In-process: the loop installs
    its handler on pytest's main thread, and a loader hook delivers the
    signal deterministically after the first batch of the resumed run."""
    import signal

    from video_filler_tpu.checkpoint import save_checkpoint
    from video_filler_tpu.train import loop as loop_mod
    from video_filler_tpu.train.step import init_train_state

    monkeypatch.chdir(tmp_path)
    opt = Opt(DATA_ROOT=image_root, loadSize=140, wtl2=0.999, nef=8,
              ngf=8, ndf=8, nBottleneck=32, batchSize=2, nThreads=0,
              computeDtype="float32", ntrain=8, manualSeed=222,
              display=False, checkpointEvery=100000, niter=100000,
              name="ret", autoResume=True, keepCheckpoints=1)
    # Three pre-existing checkpoints (epochs 1-3), as from earlier epoch
    # saves or prior preemptions of a keep-everything run.
    state0 = init_train_state(jax.random.PRNGKey(0), opt, "center")
    for ep in (1, 2, 3):
        save_checkpoint("checkpoints", "ret", ep, state0)

    class SigtermLoader(loop_mod.DataLoader):
        def get_batch(self):
            b = super().get_batch()
            os.kill(os.getpid(), signal.SIGTERM)  # preempt after this step
            return b

    monkeypatch.setattr(loop_mod, "DataLoader", SigtermLoader)
    train(opt, "center", quiet=True)  # resumes at epoch 4, steps once, saves

    names = sorted(os.path.basename(p) for p in
                   glob.glob("checkpoints/ret_*_state.npz"))
    # prune-before-save with keep=1: the newest prior checkpoint survives
    # alongside the preemption save; epochs 1 and 2 are deleted.
    assert names == ["ret_3_state.npz", "ret_4_state.npz"], names


def test_resume_does_not_replay_data_stream(video_root, tmp_path,
                                            monkeypatch):
    """A resumed run must not re-see the run's first batches: the loader is
    reseeded with the restored global step folded in (and the per-step seed
    stream continues from the global step instead of restarting at 0)."""
    from video_filler_tpu.train import loop as loop_mod

    seeds = []
    orig_loader = loop_mod.DataLoader

    class RecordingLoader(orig_loader):
        def __init__(self, *a, **k):
            seeds.append(k.get("seed"))
            super().__init__(*a, **k)

    monkeypatch.setattr(loop_mod, "DataLoader", RecordingLoader)
    monkeypatch.chdir(tmp_path)
    opt = Opt(DATA_ROOT=video_root, loadSize=150, predLen=2, wtl2=0.999,
              weight_nomask=0.05,
              maskName=os.path.join(video_root, "mask.png"), **TINY)
    train(opt, "video", quiet=True)
    state = train(opt.replace(loadName="train1", loadIter=1, niter=2),
                  "video", quiet=True)
    assert int(state.step) == 8
    assert len(seeds) == 2 and None not in seeds
    assert seeds[1] != seeds[0], \
        "resumed run reused the fresh run's loader seed (data replay)"
