"""Fused GAN train-step tests: gradient flow, loss semantics, smoke training.

Uses tiny widths so CPU compiles stay fast; the semantics under test
(blending, compositing, optimizer wiring) are width-independent.
"""

import jax
import jax.numpy as jnp
import numpy as np

from video_filler_tpu.config import Opt
from video_filler_tpu.train import init_train_state, make_train_step

TINY = dict(nef=8, ngf=8, ndf=8, nBottleneck=32, batchSize=4,
            computeDtype="float32")


def _center_batch(seed=0, b=4):
    rs = np.random.RandomState(seed)
    return {"real": jnp.asarray(
        rs.rand(b, 128, 128, 3).astype(np.float32) * 2 - 1)}


def _video_batch(seed=0, b=2, pred_len=2):
    rs = np.random.RandomState(seed)
    real = jnp.asarray(rs.rand(b, 128, 128, 3 * pred_len).astype(np.float32)
                       * 2 - 1)
    mask = jnp.zeros((b, 128, 128, 1)).at[:, 40:80, 40:80, :].set(1.0)
    return {"real": real, "mask": mask}


def test_center_step_runs_and_updates(rng):
    opt = Opt(wtl2=0.999, overlapPred=4, **TINY)
    state = init_train_state(rng, opt, "center")
    step = jax.jit(make_train_step(opt, "center"))
    batch = _center_batch()
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    for k in ("errD", "errG", "errG_l2", "errG_total"):
        assert np.isfinite(float(metrics[k])), k
    # params actually moved
    delta = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         state.params_g, new_state.params_g)
    assert max(jax.tree.leaves(delta)) > 0
    # BN running stats updated on both nets
    assert not np.allclose(
        np.asarray(new_state.state_g["enc"]["bn1"]["mean"]),
        np.asarray(state.state_g["enc"]["bn1"]["mean"]))
    assert not np.allclose(
        np.asarray(new_state.state_d["bn2"]["mean"]),
        np.asarray(state.state_d["bn2"]["mean"]))


def test_center_smoke_training_decreases_l2(rng):
    """Seeded smoke train: reconstruction improves over a few hundred steps on
    a fixed batch (the reference's only quality bar is empirical; SURVEY §4)."""
    opt = Opt(wtl2=0.999, lr=2e-4, **TINY)
    state = init_train_state(rng, opt, "center")
    step = jax.jit(make_train_step(opt, "center"))
    batch = _center_batch(1)
    first = None
    key = jax.random.PRNGKey(2)
    for i in range(60):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
        if first is None:
            first = float(metrics["errG_l2"])
    last = float(metrics["errG_l2"])
    assert last < first * 0.9, (first, last)


def test_video_step_weighted(rng):
    opt = Opt(wtl2=0.999, weight_nomask=0.05, predLen=2, wtgdl=0.1, **TINY)
    state = init_train_state(rng, opt, "video")
    step = jax.jit(make_train_step(opt, "video"))
    new_state, metrics = step(state, _video_batch(), jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["errG_total"]))
    assert float(metrics["errG_gdl"]) > 0


def test_video_hard_composite_masks_gradients(rng):
    """weight_nomask=0: D sees gt outside the mask and G's gradient flows only
    through masked pixels (train_vid_weighted.lua:429-434)."""
    opt = Opt(wtl2=0.999, weight_nomask=0.0, predLen=1, **TINY)
    state = init_train_state(rng, opt, "video")
    step = jax.jit(make_train_step(opt, "video"))
    new_state, metrics = step(state, _video_batch(pred_len=1),
                              jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["errG_total"]))


def test_gdl_quirk_changes_gradient_not_value(rng):
    opt_correct = Opt(wtl2=0.999, predLen=1, wtgdl=0.5, gdlTorchQuirk=False,
                      **TINY)
    opt_quirk = opt_correct.replace(gdlTorchQuirk=True)
    batch = _video_batch(7, b=2, pred_len=1)
    key = jax.random.PRNGKey(5)
    s0 = init_train_state(rng, opt_correct, "video")
    s_correct, m_correct = jax.jit(make_train_step(opt_correct, "video"))(
        s0, batch, key)
    s_quirk, m_quirk = jax.jit(make_train_step(opt_quirk, "video"))(
        s0, batch, key)
    # logged GDL value identical; applied gradients differ
    np.testing.assert_allclose(float(m_correct["errG_gdl"]),
                               float(m_quirk["errG_gdl"]), rtol=1e-5)
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        s_correct.params_g, s_quirk.params_g)
    assert max(jax.tree.leaves(diff)) > 0


def test_g_lr_10x_rule():
    from video_filler_tpu.train.step import _optimizers

    # 0<wtl2<1 → G lr 10x (train.lua:218-222)
    opt = Opt(wtl2=0.999, **TINY)
    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.ones((4,))}
    tx_g, tx_d = _optimizers(opt)
    ug, _ = tx_g.update(grads, tx_g.init(params), params)
    ud, _ = tx_d.update(grads, tx_d.init(params), params)
    ratio = float(ug["w"][0] / ud["w"][0])
    np.testing.assert_allclose(ratio, 10.0, rtol=1e-4)

    opt2 = Opt(wtl2=0.0, **TINY)
    tx_g2, _ = _optimizers(opt2)
    ug2, _ = tx_g2.update(grads, tx_g2.init(params), params)
    np.testing.assert_allclose(float(ug2["w"][0] / ud["w"][0]), 1.0, rtol=1e-4)


def test_noise_gen_step(rng):
    opt = Opt(wtl2=0.999, noiseGen=True, nz=16, **TINY)
    state = init_train_state(rng, opt, "center")
    step = jax.jit(make_train_step(opt, "center"))
    _, metrics = step(state, _center_batch(), jax.random.PRNGKey(6))
    assert np.isfinite(float(metrics["errG_total"]))


def test_condition_adv_step(rng):
    opt = Opt(wtl2=0.0, conditionAdv=True, **TINY)
    state = init_train_state(rng, opt, "center")
    step = jax.jit(make_train_step(opt, "center"))
    _, metrics = step(state, _center_batch(), jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["errD"]))


def test_wholeim_step(rng):
    opt = Opt(wtl2=0.999, **TINY)
    state = init_train_state(rng, opt, "wholeim")
    rs = np.random.RandomState(8)
    batch = {
        "real": jnp.asarray(rs.rand(2, 128, 128, 12).astype(np.float32) * 2 - 1),
        "mask": jnp.zeros((2, 128, 128, 12)).at[:, 30:60, 30:60, :].set(1.0),
        "masked": jnp.asarray(
            rs.rand(2, 128, 128, 27).astype(np.float32) * 2 - 1),
    }
    _, metrics = jax.jit(make_train_step(opt, "wholeim"))(
        state, batch, jax.random.PRNGKey(9))
    assert np.isfinite(float(metrics["errG_total"]))


def test_logo_step(rng):
    opt = Opt(wtl2=0.999, **TINY)
    state = init_train_state(rng, opt, "logo")
    rs = np.random.RandomState(10)
    batch = {
        "real": jnp.asarray(rs.rand(2, 128, 128, 3).astype(np.float32) * 2 - 1),
        "masked": jnp.asarray(
            rs.rand(2, 128, 128, 3).astype(np.float32) * 2 - 1),
    }
    _, metrics = jax.jit(make_train_step(opt, "logo"))(
        state, batch, jax.random.PRNGKey(11))
    assert np.isfinite(float(metrics["errG_total"]))


def test_mycrit_composite_lt_one(rng):
    """train_mycrit composites the D-fake with gt outside the mask whenever
    weight_nomask < 1 (train_mycrit.lua:431-437) — vid_weighted only at 0."""
    base = Opt(wtl2=0.999, weight_nomask=0.5, predLen=1, **TINY)
    batch = _video_batch(11, b=2, pred_len=1)
    key = jax.random.PRNGKey(12)
    s0 = init_train_state(rng, base, "video")
    s_plain, m_plain = jax.jit(make_train_step(base, "video"))(s0, batch, key)
    s_comp, m_comp = jax.jit(make_train_step(
        base.replace(compositeLtOne=True), "video"))(s0, batch, key)
    # with composite the unmasked region has zero reconstruction error,
    # so the logged L2 must be strictly smaller
    assert float(m_comp["errG_l2"]) < float(m_plain["errG_l2"])
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        s_plain.params_d, s_comp.params_d)
    assert max(jax.tree.leaves(diff)) > 0  # D saw different fakes


def test_norandblk_donkey_variant_semantics():
    """donkey_file=...norandblk... must (a) skip the random-block fallback on
    empty masks and (b) flip only the gt — the mask stays frame-fixed
    (donkey_folder_norandblk.lua:141-158) — while the default donkey flips
    clip+mask together and synthesizes blocks for empty masks
    (donkey_folder.lua:161-180)."""
    from video_filler_tpu.train.step import make_preprocess

    opt_def = Opt(predLen=1, fineSize=32, **{**TINY, "batchSize": 8})
    opt_nrb = opt_def.replace(
        donkey_file="datavid/donkey_folder_norandblk.lua")
    assert not opt_def.noRandBlk and opt_nrb.noRandBlk
    pre_def = make_preprocess(opt_def, "video")
    pre_nrb = make_preprocess(opt_nrb, "video")

    b = 8
    rs = np.random.RandomState(0)
    raw = jnp.asarray(rs.randint(0, 256, (b, 32, 32, 3), np.uint8))
    # mask only on the LEFT quarter of the frame
    mask = jnp.zeros((b, 32, 32, 1), jnp.uint8).at[:, :, :8, :].set(1)
    key = jax.random.PRNGKey(3)
    out_def = pre_def({"raw": raw, "mask": mask}, key)
    out_nrb = pre_nrb({"raw": raw, "mask": mask}, key)

    # which samples flipped? replicate the preprocess's key derivation
    k_flip = jax.random.split(key, 3)[2]
    flipped = np.asarray(jax.random.uniform(k_flip, (b,)) < 0.5)
    assert flipped.any() and (~flipped).any(), "fixture needs both cases"

    m_def = np.asarray(out_def["mask"])
    m_nrb = np.asarray(out_nrb["mask"])
    x_def = np.asarray(out_def["real"])
    x_nrb = np.asarray(out_nrb["real"])
    for i in range(b):
        # norandblk: mask NEVER flips (frame-fixed)
        assert m_nrb[i, :, :8].all() and not m_nrb[i, :, 8:].any()
        if flipped[i]:
            # default: mask flips with the clip
            assert m_def[i, :, -8:].all() and not m_def[i, :, :-8].any()
            np.testing.assert_array_equal(x_nrb[i], x_def[i])  # clip flips
            np.testing.assert_array_equal(
                x_nrb[i], np.asarray(raw[i, :, ::-1]).astype(np.float32)
                * (2.0 / 255.0) - 1.0)
        else:
            assert m_def[i, :, :8].all() and not m_def[i, :, 8:].any()
            np.testing.assert_array_equal(x_nrb[i], x_def[i])

    # empty mask: default synthesizes random blocks, norandblk does not
    empty = jnp.zeros((b, 32, 32, 1), jnp.uint8)
    out_def_e = pre_def({"raw": raw, "mask": empty}, key)
    out_nrb_e = pre_nrb({"raw": raw, "mask": empty}, key)
    assert np.asarray(out_def_e["mask"]).sum() > 0
    assert np.asarray(out_nrb_e["mask"]).sum() == 0


def test_adam_moments_bf16_flag_trains():
    """adamMomentsBf16 (HBM-saving opt-in, step._adam_lowmem): moments are
    stored bf16, the step runs and moves params in roughly the same direction
    as the f32 path on step 1 (identical up to moment rounding)."""
    opt = Opt(wtl2=0.999, **TINY)
    batch = _center_batch()
    key = jax.random.PRNGKey(0)

    s_f32 = init_train_state(jax.random.PRNGKey(5), opt, "center")
    step_f32 = jax.jit(make_train_step(opt, "center"))
    opt_bf = opt.replace(adamMomentsBf16=True)
    s_bf = init_train_state(jax.random.PRNGKey(5), opt_bf, "center")
    step_bf = jax.jit(make_train_step(opt_bf, "center"))

    assert any(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(s_bf.opt_g))

    s1, m1 = step_f32(s_f32, batch, key)
    s2, m2 = step_bf(s_bf, batch, key)
    np.testing.assert_allclose(float(m1["errD"]), float(m2["errD"]),
                               rtol=1e-5)
    # step-1 updates agree to bf16 moment rounding (~2^-8 relative on the
    # Adam direction, amplified at g~0 like everywhere else)
    a = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree.leaves(s1.params_g)])
    b = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree.leaves(s2.params_g)])
    assert np.abs(a - b).max() < 2.1 * 10 * opt.lr
    assert np.percentile(np.abs(a - b), 50) < 1e-4


def test_grad_accum_matches_single_micro_step(rng):
    """gradAccum=k scans k microbatches and Adam-steps once on the averaged
    gradients.  With a batch made of k IDENTICAL microbatches, every
    microbatch pass sees the same data, so the averaged gradients equal the
    single-microbatch gradients — post-Adam params must match a gradAccum=1
    step on one microbatch (BN running stats chain k times and differ)."""
    micro = _center_batch(b=2)
    tiled = {"real": jnp.concatenate([micro["real"]] * 3, axis=0)}
    common = dict(TINY, wtl2=0.999, overlapPred=4)
    key = jax.random.PRNGKey(5)

    opt_acc = Opt(**dict(common, batchSize=6, gradAccum=3))
    state0 = init_train_state(rng, opt_acc, "center")
    s_acc, m_acc = jax.jit(make_train_step(opt_acc, "center"))(
        state0, tiled, key)

    opt_one = Opt(**dict(common, batchSize=2))
    s_one, m_one = jax.jit(make_train_step(opt_one, "center"))(
        state0, micro, key)

    assert int(s_acc.step) == 1
    for k in m_one:
        np.testing.assert_allclose(float(m_acc[k]), float(m_one[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    for a, b in zip(jax.tree.leaves(s_acc.params_g),
                    jax.tree.leaves(s_one.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=4.1e-3)
    for a, b in zip(jax.tree.leaves(s_acc.params_d),
                    jax.tree.leaves(s_one.params_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=4.1e-3)


def test_remat_step_matches_plain_step(rng):
    """remat=1 wraps the joint loss in jax.checkpoint — the backward replays
    the IDENTICAL forward ops, so the post-Adam state must match the plain
    step bit-for-bit (it is a scheduling change, not a numeric one)."""
    batch = _video_batch()
    key = jax.random.PRNGKey(7)
    common = dict(TINY, batchSize=2, predLen=2, wtl2=0.999,
                  weight_nomask=0.05)

    state0 = init_train_state(rng, Opt(**common), "video")
    s_plain, m_plain = jax.jit(make_train_step(Opt(**common), "video"))(
        state0, batch, key)
    s_remat, m_remat = jax.jit(
        make_train_step(Opt(**dict(common, remat=1)), "video"))(
        state0, batch, key)

    for k in m_plain:
        np.testing.assert_allclose(float(m_remat[k]), float(m_plain[k]),
                                   rtol=1e-6, err_msg=k)
    for a, b in zip(jax.tree.leaves(s_remat.params_g),
                    jax.tree.leaves(s_plain.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree.leaves(s_remat.state_g),
                    jax.tree.leaves(s_plain.state_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_remat_composes_with_grad_accum(rng):
    """remat under the gradAccum scan: each microbatch's forward is replayed
    in its backward — the two memory levers stack."""
    opt = Opt(predLen=2, wtl2=0.999, weight_nomask=0.05, gradAccum=2,
              remat=1, **dict(TINY, batchSize=4))
    state = init_train_state(rng, opt, "video")
    step = jax.jit(make_train_step(opt, "video"))
    new_state, metrics = step(state, _video_batch(b=4),
                              jax.random.PRNGKey(3))
    assert int(new_state.step) == 1
    assert all(np.isfinite(float(v)) for v in metrics.values())


def test_grad_accum_video_regime_runs(rng):
    """Accumulation also covers the masked regimes (mask + per-pixel l2
    weights split with the batch; scalars shared)."""
    opt = Opt(predLen=2, wtl2=0.999, weight_nomask=0.05, gradAccum=2,
              **TINY)
    state = init_train_state(rng, opt, "video")
    step = jax.jit(make_train_step(opt, "video"))
    new_state, metrics = step(state, _video_batch(b=4), jax.random.PRNGKey(2))
    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_grad_accum_noise_gen_runs(rng):
    """The per-sample noise tensor splits with the batch under accumulation
    (the (ctx, z) generator-input pair is rebuilt per microbatch)."""
    opt = Opt(wtl2=0.999, overlapPred=4, noiseGen=True, gradAccum=2, **TINY)
    state = init_train_state(rng, opt, "center")
    step = jax.jit(make_train_step(opt, "center"))
    new_state, metrics = step(state, _center_batch(), jax.random.PRNGKey(3))
    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_grad_accum_condition_adv_runs(rng):
    """conditionAdv's (ctx, pred) discriminator input is rebuilt per
    microbatch from the split prep — compose with accumulation."""
    opt = Opt(wtl2=0.0, conditionAdv=True, gradAccum=2, **TINY)
    state = init_train_state(rng, opt, "center")
    step = jax.jit(make_train_step(opt, "center"))
    new_state, metrics = step(state, _center_batch(), jax.random.PRNGKey(4))
    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_condition_adv_rejected_outside_center(rng):
    """Only the center trainer builds the conditional D; other regimes must
    reject conditionAdv loudly instead of crashing at trace time (the
    reference forces it off in its other trainers)."""
    import pytest

    opt = Opt(wtl2=0.999, conditionAdv=True, predLen=2, **TINY)
    with pytest.raises(ValueError, match="conditionAdv"):
        make_train_step(opt, "video")


def test_errg_total_is_the_optimized_objective(rng):
    """errG_total must be the ACTUAL optimized G loss.  With uniform L2
    weights it equals the adv + wtl2*mse decomposition; with an overlapPred
    ring the 10x border weighting makes it strictly larger than the
    unweighted reconstruction (the value the old metric reported)."""
    batch = _center_batch()
    opt_u = Opt(wtl2=0.5, overlapPred=0, **TINY)
    state = init_train_state(rng, opt_u, "center")
    _, m = jax.jit(make_train_step(opt_u, "center"))(
        state, batch, jax.random.PRNGKey(1))
    recon = 0.5 * float(m["errG"]) + 0.5 * float(m["errG_l2"])
    np.testing.assert_allclose(float(m["errG_total"]), recon, rtol=1e-5)

    opt_r = Opt(wtl2=0.5, overlapPred=4, **TINY)
    state = init_train_state(rng, opt_r, "center")
    _, m2 = jax.jit(make_train_step(opt_r, "center"))(
        state, batch, jax.random.PRNGKey(1))
    recon2 = 0.5 * float(m2["errG"]) + 0.5 * float(m2["errG_l2"])
    assert float(m2["errG_total"]) > recon2, \
        "ring-weighted objective should exceed the unweighted decomposition"
