"""Checkpoint roundtrip: params, BN stats, BOTH Adam states, step counter."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_filler_tpu.checkpoint import (
    restore_checkpoint,
    restore_latest,
    save_checkpoint,
)
from video_filler_tpu.config import Opt
from video_filler_tpu.train import init_train_state, make_train_step

TINY = dict(nef=8, ngf=8, ndf=8, nBottleneck=32, batchSize=2,
            computeDtype="float32")


def _batch(b=2):
    rs = np.random.RandomState(0)
    return {"real": jnp.asarray(rs.rand(b, 128, 128, 3).astype(np.float32)
                                * 2 - 1)}


def test_roundtrip_exact_resume(tmp_path, rng):
    opt = Opt(wtl2=0.999, **TINY)
    step = jax.jit(make_train_step(opt, "center"))
    state = init_train_state(rng, opt, "center")
    state, _ = step(state, _batch(), jax.random.PRNGKey(1))

    path = save_checkpoint(str(tmp_path), "exp", 1, state,
                           meta={"regime": "center"})
    target = init_train_state(jax.random.PRNGKey(9), opt, "center")
    restored, meta = restore_checkpoint(path, target)
    assert meta["regime"] == "center"
    assert int(restored.step) == 1

    # the restored tree is bit-identical to the saved one on EVERY component
    # (D optimizer and BN running stats don't influence the next G update, so
    # comparing them directly is the only way they're covered)
    for la, lb in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    # continuing from restored state is bit-identical to continuing original
    k = jax.random.PRNGKey(2)
    a, _ = step(state, _batch(), k)
    b, _ = step(restored, _batch(), k)
    for la, lb in zip(jax.tree.leaves(a.params_g), jax.tree.leaves(b.params_g)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    for la, lb in zip(jax.tree.leaves(a.opt_g), jax.tree.leaves(b.opt_g)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_restore_latest(tmp_path, rng):
    opt = Opt(**TINY)
    state = init_train_state(rng, opt, "center")
    save_checkpoint(str(tmp_path), "exp", 2, state)
    save_checkpoint(str(tmp_path), "exp", 10, state)
    save_checkpoint(str(tmp_path), "other", 99, state)
    target = init_train_state(jax.random.PRNGKey(1), opt, "center")
    out = restore_latest(str(tmp_path), "exp", target)
    assert out is not None
    _, _, epoch = out
    assert epoch == 10
    assert restore_latest(str(tmp_path), "missing", target) is None


def test_shape_mismatch_fails_loudly(tmp_path, rng):
    opt = Opt(**TINY)
    state = init_train_state(rng, opt, "center")
    path = save_checkpoint(str(tmp_path), "exp", 1, state)
    wrong = init_train_state(rng, opt.replace(nef=16), "center")
    with pytest.raises(ValueError, match="shape mismatch"):
        restore_checkpoint(path, wrong)


def test_restore_subtree_g_only(tmp_path, rng):
    """G-only import (ckpt.restore_subtree): loads the generator from a full
    checkpoint without requiring D/optimizer shape match — the reference's
    util.load-a-single-net semantics for initName/eval."""
    from video_filler_tpu.checkpoint import restore_subtree, save_checkpoint
    from video_filler_tpu.config import Opt
    from video_filler_tpu.models import build_for_regime
    from video_filler_tpu.train import init_train_state

    opt = Opt(nef=8, ngf=8, ndf=8, nBottleneck=32, computeDtype="float32")
    state = init_train_state(rng, opt, "video")
    p = save_checkpoint(str(tmp_path), "g_only", 1, state, meta={})

    gen = build_for_regime(opt, "video")[0]
    params_t, state_t = gen.init(jax.random.PRNGKey(42))  # different init
    params = restore_subtree(p, params_t, ".params_g")
    bn = restore_subtree(p, state_t, ".state_g")
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state.params_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(bn), jax.tree.leaves(state.state_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a DIFFERENT-ndf target must still succeed (D never touched)...
    gen2 = build_for_regime(opt.replace(ndf=16), "video")[0]
    pt2, _ = gen2.init(rng)
    params2 = restore_subtree(p, pt2, ".params_g")
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
        params2, params))
    # ...while a wrong-G target fails loudly
    gen3 = build_for_regime(opt.replace(ngf=16), "video")[0]
    pt3, _ = gen3.init(rng)
    import pytest
    with pytest.raises((KeyError, ValueError)):
        restore_subtree(p, pt3, ".params_g")


def test_bf16_adam_moments_checkpoint_roundtrip(tmp_path, rng):
    """adamMomentsBf16 states must survive save/restore: np.savez degrades
    raw bfloat16 to void('V2'), so the saver stores moments as f32 and
    restore casts back — resume for the low-mem mode is exact."""
    from video_filler_tpu.checkpoint import restore_checkpoint, save_checkpoint
    from video_filler_tpu.config import Opt
    from video_filler_tpu.train import init_train_state

    opt = Opt(nef=8, ngf=8, ndf=8, nBottleneck=32, batchSize=2,
              adamMomentsBf16=True, computeDtype="float32")
    state = init_train_state(rng, opt, "center")
    # step once so the moments are NONZERO — an un-stepped state would make
    # the value comparison below vacuous (zeros roundtrip under any bug)
    step = jax.jit(make_train_step(opt, "center"))
    state, _ = step(state, _batch(), jax.random.PRNGKey(3))
    assert any(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(state.opt_g))
    assert any(float(jnp.max(jnp.abs(l.astype(jnp.float32)))) > 0
               for l in jax.tree.leaves(state.opt_g)
               if hasattr(l, "dtype") and l.dtype == jnp.bfloat16)
    p = save_checkpoint(str(tmp_path), "bf16m", 1, state, meta={})
    target = init_train_state(jax.random.PRNGKey(1), opt, "center")
    restored, _ = restore_checkpoint(p, target)
    for a, b in zip(jax.tree.leaves(restored.opt_g),
                    jax.tree.leaves(state.opt_g)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a).astype(np.float32),
                                      np.asarray(b).astype(np.float32))


def test_async_write_failure_surfaces(tmp_path, rng, monkeypatch):
    """A failed background write must raise (at the next save or at
    wait_pending_saves) instead of silently dropping the checkpoint while
    the loop keeps logging 'checkpoint: <path>'."""
    from video_filler_tpu.checkpoint import ckpt, wait_pending_saves

    opt = Opt(**TINY)
    state = init_train_state(rng, opt, "center")

    def boom(*a, **kw):
        raise OSError(28, "No space left on device")

    monkeypatch.setattr(ckpt.np, "savez", boom)
    save_checkpoint(str(tmp_path), "x", 1, state, async_write=True)
    with pytest.raises(RuntimeError, match="NOT saved"):
        wait_pending_saves()
    # the error queue is drained: a subsequent healthy wait is clean
    wait_pending_saves()

    monkeypatch.undo()
    # a pending error also surfaces at the NEXT async save call
    monkeypatch.setattr(ckpt.np, "savez", boom)
    save_checkpoint(str(tmp_path), "x", 2, state, async_write=True)
    ckpt._PENDING_SAVES[-1].join()
    monkeypatch.undo()
    with pytest.raises(RuntimeError, match="NOT saved"):
        save_checkpoint(str(tmp_path), "x", 3, state, async_write=True)
    wait_pending_saves()


def test_prune_checkpoints(tmp_path, rng):
    """keepCheckpoints retention: newest N of THIS run's files survive;
    other runs' checkpoints and keep<=0 are untouched."""
    from video_filler_tpu.checkpoint import prune_checkpoints

    opt = Opt(**TINY)
    state = init_train_state(rng, opt, "center")
    for e in (1, 2, 3, 4):
        save_checkpoint(str(tmp_path), "runA", e, state)
    save_checkpoint(str(tmp_path), "runB", 9, state)

    assert prune_checkpoints(str(tmp_path), "runA", 0) == []
    deleted = prune_checkpoints(str(tmp_path), "runA", 2)
    assert sorted(os.path.basename(p) for p in deleted) == \
        ["runA_1_state.npz", "runA_2_state.npz"]
    left = sorted(p.name for p in tmp_path.iterdir())
    assert left == ["runA_3_state.npz", "runA_4_state.npz",
                    "runB_9_state.npz"]
    # missing dir: no-op
    assert prune_checkpoints(str(tmp_path / "nope"), "x", 3) == []
