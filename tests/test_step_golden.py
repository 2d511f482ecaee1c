"""Full-step gradient golden test.

Replicates the reference's training-step math in PyTorch (the numerical
oracle for Torch7 semantics) and asserts our fused step computes the SAME
gradients for both networks:

fDx (train.lua:278-350): D-real BCE + D-fake BCE with the fake detached;
fGx (train.lua:353-409): adversarial BCE on the fake-pass output with D's
params frozen, blended with the (ring-weighted) L2 gradient:
    df_dg = (1-wtl2)*dAdv + wtl2Matrix .* 2(fake-target)/N.

BN runs in train mode in the same order (real pass, then fake pass), exactly
as the reference forwards.  The weights are shared through the t7-layout
mapping used by the importer, so this also pins the layout conventions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from video_filler_tpu.config import Opt
from video_filler_tpu.models import build_for_regime
from video_filler_tpu.ops import losses, masks

NEF = NGF = NDF = 8
NB = 16
WTL2 = 0.999
OVERLAP = 4


def _torch_generator():
    conv = lambda i, o, k=4, s=2, p=1: nn.Conv2d(i, o, k, s, p, bias=False)
    deconv = lambda i, o, k=4, s=2, p=1: nn.ConvTranspose2d(i, o, k, s, p,
                                                            bias=False)
    return nn.Sequential(
        conv(3, NEF), nn.LeakyReLU(0.2),
        conv(NEF, NEF), nn.BatchNorm2d(NEF), nn.LeakyReLU(0.2),
        conv(NEF, NEF * 2), nn.BatchNorm2d(NEF * 2), nn.LeakyReLU(0.2),
        conv(NEF * 2, NEF * 4), nn.BatchNorm2d(NEF * 4), nn.LeakyReLU(0.2),
        conv(NEF * 4, NEF * 8), nn.BatchNorm2d(NEF * 8), nn.LeakyReLU(0.2),
        conv(NEF * 8, NB, 4, 1, 0),
        nn.BatchNorm2d(NB), nn.LeakyReLU(0.2),
        deconv(NB, NGF * 8, 4, 1, 0), nn.BatchNorm2d(NGF * 8), nn.ReLU(),
        deconv(NGF * 8, NGF * 4), nn.BatchNorm2d(NGF * 4), nn.ReLU(),
        deconv(NGF * 4, NGF * 2), nn.BatchNorm2d(NGF * 2), nn.ReLU(),
        deconv(NGF * 2, NGF), nn.BatchNorm2d(NGF), nn.ReLU(),
        deconv(NGF, 3), nn.Tanh())


def _torch_discriminator():
    conv = lambda i, o, k=4, s=2, p=1: nn.Conv2d(i, o, k, s, p, bias=False)
    return nn.Sequential(
        conv(3, NDF), nn.LeakyReLU(0.2),
        conv(NDF, NDF * 2), nn.BatchNorm2d(NDF * 2), nn.LeakyReLU(0.2),
        conv(NDF * 2, NDF * 4), nn.BatchNorm2d(NDF * 4), nn.LeakyReLU(0.2),
        conv(NDF * 4, NDF * 8), nn.BatchNorm2d(NDF * 8), nn.LeakyReLU(0.2),
        conv(NDF * 8, 1, 4, 1, 0))


def test_full_step_gradients_match_torch(rng):
    torch.manual_seed(0)
    opt = Opt(nef=NEF, ngf=NGF, ndf=NDF, nBottleneck=NB, batchSize=2,
              wtl2=WTL2, overlapPred=OVERLAP, computeDtype="float32")

    tg, td = _torch_generator(), _torch_discriminator()
    tg.train(), td.train()

    # ---- import torch weights into our pytrees (shared mapping helper —
    # this is the single definition of the layout convention being pinned)
    gen, disc = build_for_regime(opt, "center")
    gp, gs, dp, ds = _share_weights_into(tg, td, gen, disc, rng)
    enc_names = [f"conv{i}" for i in range(6)]
    dec_names = [f"up{i}" for i in range(5)]

    # ---- shared batch
    rs = np.random.RandomState(3)
    real = rs.rand(2, 128, 128, 3).astype(np.float32) * 2 - 1
    real_j = jnp.asarray(real)
    real_center_j = masks.extract_center(real_j)
    ctx_j = masks.center_mask_fill(real_j, OVERLAP)

    # ---- our gradients (the fused step's loss_fn math, directly)
    def loss_fn(gp_, dp_):
        fake, _ = gen.apply(gp_, gs, ctx_j, train=True)
        logit_real, sd1 = disc.apply(dp_, ds, real_center_j, train=True)
        logit_fake, _ = disc.apply(dp_, sd1, jax.lax.stop_gradient(fake),
                                   train=True)
        loss_d = (losses.bce_with_logits(logit_real, 1.0)
                  + losses.bce_with_logits(logit_fake, 0.0))
        logit_fake_g, _ = disc.apply(jax.lax.stop_gradient(dp_), sd1, fake,
                                     train=True)
        w = losses.overlap_l2_weights((64, 64), OVERLAP, WTL2)[None]
        loss_g = ((1 - WTL2) * losses.bce_with_logits(logit_fake_g, 1.0)
                  + losses.weighted_mse(fake, real_center_j, w))
        return loss_g + loss_d

    grad_g, grad_d = jax.grad(loss_fn, argnums=(0, 1))(gp, dp)

    # ---- torch reference gradients (reference step math)
    real_t = torch.from_numpy(real.transpose(0, 3, 1, 2))
    real_center_t = real_t[:, :, 32:96, 32:96].clone()
    ctx_t = real_t.clone()
    fill = torch.tensor([2 * 117 / 255 - 1, 2 * 104 / 255 - 1,
                         2 * 123 / 255 - 1])
    lo, hi = 32 + OVERLAP, 96 - OVERLAP
    ctx_t[:, :, lo:hi, lo:hi] = fill.view(1, 3, 1, 1)

    fake_t = tg(ctx_t)
    out_real = td(real_center_t).view(-1)
    out_fake = td(fake_t.detach()).view(-1)
    loss_d_t = (F.binary_cross_entropy_with_logits(out_real,
                                                   torch.ones_like(out_real))
                + F.binary_cross_entropy_with_logits(
                    out_fake, torch.zeros_like(out_fake)))
    td.zero_grad()
    loss_d_t.backward()
    d_grads_t = [m.weight.grad.detach().numpy().copy() for m in td
                 if isinstance(m, nn.Conv2d)]

    # G step: adversarial through a frozen-D forward + ring-weighted L2
    for p in td.parameters():
        p.requires_grad_(False)
    out_fake_g = td(fake_t).view(-1)
    wmat = np.full((64, 64), 10 * WTL2, np.float32)
    wmat[OVERLAP:64 - OVERLAP, OVERLAP:64 - OVERLAP] = WTL2
    wmat_t = torch.from_numpy(wmat).view(1, 1, 64, 64)
    loss_g_t = ((1 - WTL2) * F.binary_cross_entropy_with_logits(
                    out_fake_g, torch.ones_like(out_fake_g))
                + (wmat_t * (fake_t - real_center_t) ** 2).sum()
                / fake_t.numel())
    tg.zero_grad()
    loss_g_t.backward()
    g_grads_t = [m.weight.grad.detach().numpy().copy() for m in tg
                 if isinstance(m, (nn.Conv2d, nn.ConvTranspose2d))]

    # ---- compare (transpose back to torch layouts)
    for i, name in enumerate(enc_names):
        ours = np.asarray(grad_g["enc"][name]["w"]).transpose(3, 2, 0, 1)
        np.testing.assert_allclose(ours, g_grads_t[i], rtol=2e-3, atol=2e-5,
                                   err_msg=f"G enc {name}")
    for i, name in enumerate(dec_names):
        ours = np.asarray(grad_g["dec"][name]["w"]).transpose(2, 3, 0, 1)
        np.testing.assert_allclose(ours, g_grads_t[6 + i], rtol=2e-3,
                                   atol=2e-5, err_msg=f"G dec {name}")
    for i, name in enumerate([f"conv{i}" for i in range(1, 6)]):
        ours = np.asarray(grad_d[name]["w"]).transpose(3, 2, 0, 1)
        np.testing.assert_allclose(ours, d_grads_t[i], rtol=2e-3, atol=2e-5,
                                   err_msg=f"D {name}")


def test_bn_running_stats_match_torch_after_step(rng):
    """The step's BN state updates must match torch's running statistics
    after the same forward sequence (G once; D real-pass then fake-pass,
    train.lua:299-345)."""
    torch.manual_seed(1)
    opt = Opt(nef=NEF, ngf=NGF, ndf=NDF, nBottleneck=NB, batchSize=2,
              wtl2=WTL2, overlapPred=OVERLAP, computeDtype="float32")
    tg, td = _torch_generator(), _torch_discriminator()
    tg.train(), td.train()

    gen, disc = build_for_regime(opt, "center")
    # share BOTH nets' weights/stats via the single mapping helper
    gp, gs, dp, ds = _share_weights_into(tg, td, gen, disc, rng)
    tbns = [m for m in tg if isinstance(m, nn.BatchNorm2d)]
    dbns = [m for m in td if isinstance(m, nn.BatchNorm2d)]

    rs = np.random.RandomState(7)
    real = rs.rand(2, 128, 128, 3).astype(np.float32) * 2 - 1
    real_j = jnp.asarray(real)
    ctx_j = masks.center_mask_fill(real_j, OVERLAP)
    center_j = masks.extract_center(real_j)

    # ours: G fwd, D real fwd, D fake fwd (state threaded in order)
    fake, gs2 = gen.apply(gp, gs, ctx_j, train=True)
    _, sd1 = disc.apply(dp, ds, center_j, train=True)
    _, sd2 = disc.apply(dp, sd1, fake, train=True)

    # torch: same sequence
    real_t = torch.from_numpy(real.transpose(0, 3, 1, 2))
    ctx_t = real_t.clone()
    fillv = torch.tensor([2 * 117 / 255 - 1, 2 * 104 / 255 - 1,
                          2 * 123 / 255 - 1])
    lo, hi = 32 + OVERLAP, 96 - OVERLAP
    ctx_t[:, :, lo:hi, lo:hi] = fillv.view(1, 3, 1, 1)
    with torch.no_grad():
        fake_t = tg(ctx_t)
        td(real_t[:, :, 32:96, 32:96])
        td(fake_t)

    for idx, (scope, name) in enumerate(
            [("enc", f"bn{i}") for i in range(1, 5)] + [(None, "bott_bn")]
            + [("dec", f"bn{i}") for i in range(4)]):
        m = tbns[idx]
        s = (gs2[scope] if scope else gs2)[name] if scope else gs2[name]
        np.testing.assert_allclose(np.asarray(s["mean"]),
                                   m.running_mean.numpy(), rtol=1e-3,
                                   atol=1e-5, err_msg=f"G {name} mean")
        np.testing.assert_allclose(np.asarray(s["var"]),
                                   m.running_var.numpy(), rtol=1e-3,
                                   atol=1e-5, err_msg=f"G {name} var")
    for i, name in enumerate([f"bn{i}" for i in range(2, 5)]):
        m = dbns[i]
        np.testing.assert_allclose(np.asarray(sd2[name]["mean"]),
                                   m.running_mean.numpy(), rtol=1e-3,
                                   atol=1e-5, err_msg=f"D {name} mean")
        np.testing.assert_allclose(np.asarray(sd2[name]["var"]),
                                   m.running_var.numpy(), rtol=1e-3,
                                   atol=1e-5, err_msg=f"D {name} var")


def _share_weights_into(tg, td, gen, disc, rng):
    """Copy torch G/D weights + BN stats into freshly-initialized pytrees
    (same mapping as the two goldens above)."""
    gp, gs = gen.init(rng)
    dp, ds = disc.init(jax.random.PRNGKey(1))
    tconvs = [m for m in tg if isinstance(m, (nn.Conv2d, nn.ConvTranspose2d))]
    tbns = [m for m in tg if isinstance(m, nn.BatchNorm2d)]
    for i, name in enumerate([f"conv{i}" for i in range(6)]):
        gp["enc"][name]["w"] = jnp.asarray(
            tconvs[i].weight.detach().numpy().transpose(2, 3, 1, 0))
    for i, name in enumerate([f"up{i}" for i in range(5)]):
        gp["dec"][name]["w"] = jnp.asarray(
            tconvs[6 + i].weight.detach().numpy().transpose(2, 3, 0, 1))
    for idx, (scope, name) in enumerate(
            [("enc", f"bn{i}") for i in range(1, 5)] + [(None, "bott_bn")]
            + [("dec", f"bn{i}") for i in range(4)]):
        m = tbns[idx]
        entry_p = {"gamma": jnp.asarray(m.weight.detach().numpy()),
                   "beta": jnp.asarray(m.bias.detach().numpy())}
        entry_s = {"mean": jnp.asarray(m.running_mean.numpy()),
                   "var": jnp.asarray(m.running_var.numpy())}
        if scope:
            gp[scope][name], gs[scope][name] = entry_p, entry_s
        else:
            gp[name], gs[name] = entry_p, entry_s
    dconvs = [m for m in td if isinstance(m, nn.Conv2d)]
    dbns = [m for m in td if isinstance(m, nn.BatchNorm2d)]
    for i, name in enumerate([f"conv{i}" for i in range(1, 6)]):
        dp[name]["w"] = jnp.asarray(
            dconvs[i].weight.detach().numpy().transpose(2, 3, 1, 0))
    for i, name in enumerate([f"bn{i}" for i in range(2, 5)]):
        m = dbns[i]
        dp[name] = {"gamma": jnp.asarray(m.weight.detach().numpy()),
                    "beta": jnp.asarray(m.bias.detach().numpy())}
        ds[name] = {"mean": jnp.asarray(m.running_mean.numpy()),
                    "var": jnp.asarray(m.running_var.numpy())}
    return gp, gs, dp, ds


class _AdamNp:
    """Hand-rolled Adam over numpy param lists, in either convention.

    * 'optax' (== torch.optim.Adam): upd = m̂ / (sqrt(v̂) + eps)
    * 'lua'   (Torch7 optim.adam:   stepSize = lr*sqrt(1-b2^t)/(1-b1^t),
              denom = sqrt(v) + eps  — reference train.lua:421-424):
              upd = m̂ / (sqrt(v̂) + eps/sqrt(1-b2^t))
    """

    def __init__(self, params, lr, mode, b1=0.5, b2=0.999, eps=1e-8):
        self.lr, self.mode, self.b1, self.b2, self.eps = lr, mode, b1, b2, eps
        self.m = [np.zeros_like(p) for p in params]
        self.v = [np.zeros_like(p) for p in params]
        self.t = 0

    def update(self, params, grads):
        self.t += 1
        out = []
        bc1 = 1 - self.b1 ** self.t
        bc2 = 1 - self.b2 ** self.t
        for i, (p, g) in enumerate(zip(params, grads)):
            self.m[i] = self.b1 * self.m[i] + (1 - self.b1) * g
            self.v[i] = self.b2 * self.v[i] + (1 - self.b2) * g * g
            if self.mode == "optax":
                denom = np.sqrt(self.v[i] / bc2) + self.eps
                out.append(p - self.lr * (self.m[i] / bc1) / denom)
            else:  # lua
                step = self.lr * np.sqrt(bc2) / bc1
                out.append(p - step * self.m[i] / (np.sqrt(self.v[i])
                                                   + self.eps))
        return out


def _run_torch_trajectory(tg0, td0, reals, opt, mode, n_steps):
    """Replica of the fused step's per-step math (simultaneous updates)
    driven by _AdamNp in the given convention; returns (G conv weights in
    our layout, per-step (errD, errG_l2) losses)."""
    tg2, td2 = _torch_generator(), _torch_discriminator()
    tg2.load_state_dict(tg0.state_dict())
    td2.load_state_dict(td0.state_dict())
    tg2.train(), td2.train()
    g_params = [m.weight for m in tg2
                if isinstance(m, (nn.Conv2d, nn.ConvTranspose2d))]
    g_affine = [p for m in tg2 if isinstance(m, nn.BatchNorm2d)
                for p in (m.weight, m.bias)]
    d_params = [m.weight for m in td2 if isinstance(m, nn.Conv2d)]
    d_affine = [p for m in td2 if isinstance(m, nn.BatchNorm2d)
                for p in (m.weight, m.bias)]
    adam_g = _AdamNp([p.detach().numpy() for p in g_params + g_affine],
                     opt.lr * 10, mode)
    adam_d = _AdamNp([p.detach().numpy() for p in d_params + d_affine],
                     opt.lr, mode)
    wmat = np.full((64, 64), 10 * WTL2, np.float32)
    wmat[OVERLAP:64 - OVERLAP, OVERLAP:64 - OVERLAP] = WTL2
    wmat_t = torch.from_numpy(wmat).view(1, 1, 64, 64)
    fill = torch.tensor([2 * 117 / 255 - 1, 2 * 104 / 255 - 1,
                         2 * 123 / 255 - 1])
    lo, hi = 32 + OVERLAP, 96 - OVERLAP
    losses_t = []
    for i in range(n_steps):
        real_t = torch.from_numpy(reals[i].transpose(0, 3, 1, 2))
        center_t = real_t[:, :, 32:96, 32:96].clone()
        ctx_t = real_t.clone()
        ctx_t[:, :, lo:hi, lo:hi] = fill.view(1, 3, 1, 1)
        fake_t = tg2(ctx_t)
        out_real = td2(center_t).view(-1)
        out_fake = td2(fake_t.detach()).view(-1)
        loss_d = (F.binary_cross_entropy_with_logits(
                      out_real, torch.ones_like(out_real))
                  + F.binary_cross_entropy_with_logits(
                      out_fake, torch.zeros_like(out_fake)))
        td2.zero_grad(), tg2.zero_grad()
        loss_d.backward()
        d_grads = [p.grad.detach().numpy().copy()
                   for p in d_params + d_affine]
        # G pass: frozen D, batch-stat BN without a running-stat update
        for p in td2.parameters():
            p.requires_grad_(False)
        moms = [(m, m.momentum) for m in td2
                if isinstance(m, nn.BatchNorm2d)]
        for m, _ in moms:
            m.momentum = 0.0
        out_fake_g = td2(fake_t).view(-1)
        for m, mom in moms:
            m.momentum = mom
        for p in td2.parameters():
            p.requires_grad_(True)
        l2_t = ((wmat_t * (fake_t - center_t) ** 2).sum()
                / fake_t.numel())
        loss_g = ((1 - WTL2) * F.binary_cross_entropy_with_logits(
                      out_fake_g, torch.ones_like(out_fake_g)) + l2_t)
        tg2.zero_grad()
        loss_g.backward()
        g_grads = [p.grad.detach().numpy().copy()
                   for p in g_params + g_affine]
        new_g = adam_g.update([p.detach().numpy()
                               for p in g_params + g_affine], g_grads)
        new_d = adam_d.update([p.detach().numpy()
                               for p in d_params + d_affine], d_grads)
        with torch.no_grad():
            for p, nv in zip(g_params + g_affine, new_g):
                p.copy_(torch.from_numpy(nv))
            for p, nv in zip(d_params + d_affine, new_d):
                p.copy_(torch.from_numpy(nv))
        # errG_l2 is logged UNWEIGHTED in the step (train/step.py)
        losses_t.append((float(loss_d.detach()),
                         float(F.mse_loss(fake_t, center_t).detach())))
    ws = []
    for m in tg2:
        if isinstance(m, nn.Conv2d):
            ws.append(m.weight.detach().numpy().transpose(2, 3, 1, 0))
        elif isinstance(m, nn.ConvTranspose2d):
            ws.append(m.weight.detach().numpy().transpose(2, 3, 0, 1))
    return ws, losses_t


def test_adam_trajectory_matches_torch_five_steps(rng):
    """N-step trained-weights golden vs a torch replica with hand-rolled
    Adam (reference two-optimizer loop, train.lua:421-424).

    GAN steps chaotically amplify Adam's sign-function behavior at g~0
    (measured ~10x/step), so the assertions are per-step-valid:
    * after step 1 the weights match tightly (p99 < 1e-5; lone entries may
      cost one sign-flip = 2*lr_G);
    * the per-step LOSS trajectory tracks over all 5 steps;
    * the Torch7-vs-optax eps-placement divergence (documented in
      train/step.py) is quantified replica-vs-replica at step 1, where both
      saw bit-identical gradients.
    """
    from video_filler_tpu.train import init_train_state, make_train_step

    torch.manual_seed(4)
    n_steps = 5
    opt = Opt(nef=NEF, ngf=NGF, ndf=NDF, nBottleneck=NB, batchSize=2,
              wtl2=WTL2, overlapPred=OVERLAP, computeDtype="float32")
    tg, td = _torch_generator(), _torch_discriminator()
    tg.train(), td.train()
    gen, disc = build_for_regime(opt, "center")
    gp, gs, dp, ds = _share_weights_into(tg, td, gen, disc, rng)

    state = init_train_state(jax.random.PRNGKey(9), opt, "center")
    state = state._replace(params_g=gp, params_d=dp, state_g=gs, state_d=ds)
    step = jax.jit(make_train_step(opt, "center"))
    rs = np.random.RandomState(11)
    reals = [rs.rand(2, 128, 128, 3).astype(np.float32) * 2 - 1
             for _ in range(n_steps)]

    def ours_g_weights(st):
        return ([np.asarray(st.params_g["enc"][f"conv{i}"]["w"])
                 for i in range(6)]
                + [np.asarray(st.params_g["dec"][f"up{i}"]["w"])
                   for i in range(5)])

    losses_ours = []
    state1 = None
    for i in range(n_steps):
        state, m = step(state, {"real": jnp.asarray(reals[i])},
                        jax.random.PRNGKey(100 + i))
        losses_ours.append((float(m["errD"]), float(m["errG_l2"])))
        if i == 0:
            state1 = state

    ref_w_px1, _ = _run_torch_trajectory(tg, td, reals, opt, "optax", 1)
    ref_w_lua1, _ = _run_torch_trajectory(tg, td, reals, opt, "lua", 1)
    ref_w_px, losses_px = _run_torch_trajectory(tg, td, reals, opt, "optax",
                                                n_steps)

    # step-1 weights: tight bulk agreement; isolated g~0 sign flips <= 2*lr_G
    diffs1 = np.concatenate([(a - b).ravel() for a, b in
                             zip(ours_g_weights(state1), ref_w_px1)])
    assert np.percentile(np.abs(diffs1), 99) < 1e-5, \
        f"p99 {np.percentile(np.abs(diffs1), 99):.2e}"
    assert np.abs(diffs1).max() <= 2.05 * 10 * opt.lr

    # loss trajectory tracks through all steps (both nets, all 5 steps)
    for i, ((d_o, l2_o), (d_t, l2_t)) in enumerate(zip(losses_ours,
                                                       losses_px)):
        np.testing.assert_allclose(d_o, d_t, rtol=0.05,
                                   err_msg=f"errD step {i + 1}")
        np.testing.assert_allclose(l2_o, l2_t, rtol=0.05,
                                   err_msg=f"errG_l2 step {i + 1}")

    # eps-placement divergence, replica vs replica on identical gradients:
    # nonzero (the conventions really differ) but far below one update.
    eps_diff = np.concatenate([(a - b).ravel() for a, b in
                               zip(ref_w_px1, ref_w_lua1)])
    assert 0 < np.abs(eps_diff).max() < 10 * opt.lr, \
        f"eps-placement max diff {np.abs(eps_diff).max():.2e}"

    # end-state sanity: bounded by the chaotic sign-flip envelope
    diffs5 = np.concatenate([(a - b).ravel() for a, b in
                             zip(ours_g_weights(state), ref_w_px)])
    assert np.abs(diffs5).max() < 2 * 10 * opt.lr * n_steps


PL_VID, NC_VID = 2, 6
LAM_VID, WTGDL_VID = 0.05, 0.1


def _torch_video_nets():
    """Torch replicas of the video-regime 128-out G / BN-free-head D."""
    conv = lambda i, o, k=4, s=2, p=1: nn.Conv2d(i, o, k, s, p, bias=False)
    deconv = lambda i, o, k=4, s=2, p=1: nn.ConvTranspose2d(i, o, k, s, p,
                                                            bias=False)
    NC = NC_VID
    tg = nn.Sequential(
        conv(NC, NEF), nn.LeakyReLU(0.2),
        conv(NEF, NEF), nn.BatchNorm2d(NEF), nn.LeakyReLU(0.2),
        conv(NEF, NEF * 2), nn.BatchNorm2d(NEF * 2), nn.LeakyReLU(0.2),
        conv(NEF * 2, NEF * 4), nn.BatchNorm2d(NEF * 4), nn.LeakyReLU(0.2),
        conv(NEF * 4, NEF * 8), nn.BatchNorm2d(NEF * 8), nn.LeakyReLU(0.2),
        conv(NEF * 8, NB, 4, 1, 0),
        nn.BatchNorm2d(NB), nn.LeakyReLU(0.2),
        deconv(NB, NGF * 8, 4, 1, 0), nn.BatchNorm2d(NGF * 8), nn.ReLU(),
        deconv(NGF * 8, NGF * 4), nn.BatchNorm2d(NGF * 4), nn.ReLU(),
        deconv(NGF * 4, NGF * 2), nn.BatchNorm2d(NGF * 2), nn.ReLU(),
        deconv(NGF * 2, NGF), nn.BatchNorm2d(NGF), nn.ReLU(),
        deconv(NGF, NGF), nn.BatchNorm2d(NGF), nn.ReLU(),
        deconv(NGF, NC), nn.Tanh())
    td = nn.Sequential(
        conv(NC, NDF // 2), nn.LeakyReLU(0.2),
        conv(NDF // 2, NDF), nn.LeakyReLU(0.2),
        conv(NDF, NDF * 2), nn.BatchNorm2d(NDF * 2), nn.LeakyReLU(0.2),
        conv(NDF * 2, NDF * 4), nn.BatchNorm2d(NDF * 4), nn.LeakyReLU(0.2),
        conv(NDF * 4, NDF * 8), nn.BatchNorm2d(NDF * 8), nn.LeakyReLU(0.2),
        conv(NDF * 8, 1, 4, 1, 0))
    return tg, td


def _share_video_weights_into(tg, td, gen, disc, rng):
    """Copy the torch video nets' weights + BN stats into our pytrees."""
    gp, gs = gen.init(rng)
    dp, ds = disc.init(jax.random.PRNGKey(1))
    tconvs = [m for m in tg if isinstance(m, (nn.Conv2d, nn.ConvTranspose2d))]
    tbns = [m for m in tg if isinstance(m, nn.BatchNorm2d)]
    for i, name in enumerate([f"conv{i}" for i in range(6)]):
        gp["enc"][name]["w"] = jnp.asarray(
            tconvs[i].weight.detach().numpy().transpose(2, 3, 1, 0))
    for i, name in enumerate([f"up{i}" for i in range(6)]):
        gp["dec"][name]["w"] = jnp.asarray(
            tconvs[6 + i].weight.detach().numpy().transpose(2, 3, 0, 1))

    def _bn(m):
        return ({"gamma": jnp.asarray(m.weight.detach().numpy()),
                 "beta": jnp.asarray(m.bias.detach().numpy())},
                {"mean": jnp.asarray(m.running_mean.numpy()),
                 "var": jnp.asarray(m.running_var.numpy())})

    for i, name in enumerate([f"bn{i}" for i in range(1, 5)]):
        gp["enc"][name], gs["enc"][name] = _bn(tbns[i])
    gp["bott_bn"], gs["bott_bn"] = _bn(tbns[4])
    for i, name in enumerate([f"bn{i}" for i in range(5)]):
        gp["dec"][name], gs["dec"][name] = _bn(tbns[5 + i])
    dconvs = [m for m in td if isinstance(m, nn.Conv2d)]
    dbns = [m for m in td if isinstance(m, nn.BatchNorm2d)]
    for i, name in enumerate([f"conv{i}" for i in range(6)]):
        dp[name]["w"] = jnp.asarray(
            dconvs[i].weight.detach().numpy().transpose(2, 3, 1, 0))
    for i, name in enumerate([f"bn{i}" for i in range(2, 5)]):
        dp[name], ds[name] = _bn(dbns[i])
    return gp, gs, dp, ds


def _run_torch_video_trajectory(tg0, td0, reals, masks_np, opt, mode,
                                n_steps):
    """Torch replica of the fused VIDEO step — λ-weighted L2
    (train_vid_weighted.lua:494-497), hard composite inside the mask
    (train_mycrit.lua:431-437), GDL quirk (MSE gradient, :524-527) — driven
    by _AdamNp in the given eps convention; returns (G conv weights in our
    layout, per-step (errD, errG_l2))."""
    tg2, td2 = _torch_video_nets()
    tg2.load_state_dict(tg0.state_dict())
    td2.load_state_dict(td0.state_dict())
    tg2.train(), td2.train()
    g_params = [m.weight for m in tg2
                if isinstance(m, (nn.Conv2d, nn.ConvTranspose2d))]
    g_affine = [p for m in tg2 if isinstance(m, nn.BatchNorm2d)
                for p in (m.weight, m.bias)]
    d_params = [m.weight for m in td2 if isinstance(m, nn.Conv2d)]
    d_affine = [p for m in td2 if isinstance(m, nn.BatchNorm2d)
                for p in (m.weight, m.bias)]
    adam_g = _AdamNp([p.detach().numpy() for p in g_params + g_affine],
                     opt.lr * 10, mode)
    adam_d = _AdamNp([p.detach().numpy() for p in d_params + d_affine],
                     opt.lr, mode)
    fillv = 2.0 * opt.maskValue - 1.0
    losses_t = []
    for i in range(n_steps):
        real_t = torch.from_numpy(reals[i].transpose(0, 3, 1, 2))
        mask_t = torch.from_numpy(masks_np[i].transpose(0, 3, 1, 2))
        ctx_t = real_t * (1 - mask_t) + fillv * mask_t
        fake_t = tg2(ctx_t)
        # hard composite: only masked pixels come from G (fill_in)
        comp_t = real_t * (1 - mask_t) + fake_t * mask_t
        out_real = td2(real_t).view(-1)
        out_fake = td2(comp_t.detach()).view(-1)
        loss_d = (F.binary_cross_entropy_with_logits(
                      out_real, torch.ones_like(out_real))
                  + F.binary_cross_entropy_with_logits(
                      out_fake, torch.zeros_like(out_fake)))
        td2.zero_grad(), tg2.zero_grad()
        loss_d.backward()
        d_grads = [p.grad.detach().numpy().copy()
                   for p in d_params + d_affine]
        # G pass: frozen D, batch-stat BN without a running-stat update
        for p in td2.parameters():
            p.requires_grad_(False)
        moms = [(m, m.momentum) for m in td2
                if isinstance(m, nn.BatchNorm2d)]
        for m, _ in moms:
            m.momentum = 0.0
        out_fake_g = td2(comp_t).view(-1)
        for m, mom in moms:
            m.momentum = mom
        for p in td2.parameters():
            p.requires_grad_(True)
        weights_t = WTL2 * (mask_t * (1 - LAM_VID) + LAM_VID)
        loss_g = ((1 - WTL2) * F.binary_cross_entropy_with_logits(
                      out_fake_g, torch.ones_like(out_fake_g))
                  + (weights_t * (comp_t - real_t) ** 2).sum()
                  / comp_t.numel()
                  # GDL quirk: gradient is wtgdl * d/dx MSE
                  + WTGDL_VID * ((comp_t - real_t) ** 2).mean())
        tg2.zero_grad()
        loss_g.backward()
        g_grads = [p.grad.detach().numpy().copy()
                   for p in g_params + g_affine]
        new_g = adam_g.update([p.detach().numpy()
                               for p in g_params + g_affine], g_grads)
        new_d = adam_d.update([p.detach().numpy()
                               for p in d_params + d_affine], d_grads)
        with torch.no_grad():
            for p, nv in zip(g_params + g_affine, new_g):
                p.copy_(torch.from_numpy(nv))
            for p, nv in zip(d_params + d_affine, new_d):
                p.copy_(torch.from_numpy(nv))
        losses_t.append((float(loss_d.detach()),
                         float(F.mse_loss(comp_t, real_t).detach())))
    ws = []
    for m in tg2:
        if isinstance(m, nn.Conv2d):
            ws.append(m.weight.detach().numpy().transpose(2, 3, 1, 0))
        elif isinstance(m, nn.ConvTranspose2d):
            ws.append(m.weight.detach().numpy().transpose(2, 3, 0, 1))
    return ws, losses_t


def test_video_adam_trajectory_matches_torch_five_steps(rng):
    """Flagship-regime 5-step trajectory golden (the center-regime test
    above pins the simple path; this pins the video semantics over multiple
    Adam steps: λ-weighted L2 blend + hard composite + gdlTorchQuirk
    interacting with both optimizers' state).  Same per-step-valid
    assertions: tight step-1 weights, 5-step loss-trajectory tracking, the
    eps-placement divergence quantified replica-vs-replica."""
    from video_filler_tpu.train import init_train_state, make_train_step

    torch.manual_seed(6)
    n_steps = 5
    opt = Opt(nef=NEF, ngf=NGF, ndf=NDF, nBottleneck=NB, batchSize=2,
              predLen=PL_VID, wtl2=WTL2, weight_nomask=LAM_VID,
              wtgdl=WTGDL_VID, gdlTorchQuirk=True, compositeLtOne=True,
              computeDtype="float32")
    tg, td = _torch_video_nets()
    tg.train(), td.train()
    gen, disc = build_for_regime(opt, "video")
    gp, gs, dp, ds = _share_video_weights_into(tg, td, gen, disc, rng)

    state = init_train_state(jax.random.PRNGKey(9), opt, "video")
    state = state._replace(params_g=gp, params_d=dp, state_g=gs, state_d=ds)
    step = jax.jit(make_train_step(opt, "video"))
    rs = np.random.RandomState(13)
    reals, masks_np = [], []
    for _ in range(n_steps):
        reals.append(rs.rand(2, 128, 128, NC_VID).astype(np.float32) * 2 - 1)
        m = np.zeros((2, 128, 128, 1), np.float32)
        for b in range(2):
            y, x = rs.randint(10, 60, size=2)
            h, w = rs.randint(30, 60, size=2)
            m[b, y:y + h, x:x + w] = 1.0
        masks_np.append(m)

    def ours_g_weights(st):
        return ([np.asarray(st.params_g["enc"][f"conv{i}"]["w"])
                 for i in range(6)]
                + [np.asarray(st.params_g["dec"][f"up{i}"]["w"])
                   for i in range(6)])

    losses_ours = []
    state1 = None
    for i in range(n_steps):
        state, m = step(state, {"real": jnp.asarray(reals[i]),
                                "mask": jnp.asarray(masks_np[i])},
                        jax.random.PRNGKey(200 + i))
        losses_ours.append((float(m["errD"]), float(m["errG_l2"])))
        if i == 0:
            state1 = state

    ref_w_px1, _ = _run_torch_video_trajectory(tg, td, reals, masks_np, opt,
                                               "optax", 1)
    ref_w_lua1, _ = _run_torch_video_trajectory(tg, td, reals, masks_np, opt,
                                                "lua", 1)
    ref_w_px, losses_px = _run_torch_video_trajectory(tg, td, reals, masks_np,
                                                      opt, "optax", n_steps)

    diffs1 = np.concatenate([(a - b).ravel() for a, b in
                             zip(ours_g_weights(state1), ref_w_px1)])
    assert np.percentile(np.abs(diffs1), 99) < 1e-5, \
        f"p99 {np.percentile(np.abs(diffs1), 99):.2e}"
    assert np.abs(diffs1).max() <= 2.05 * 10 * opt.lr

    for i, ((d_o, l2_o), (d_t, l2_t)) in enumerate(zip(losses_ours,
                                                       losses_px)):
        np.testing.assert_allclose(d_o, d_t, rtol=0.05,
                                   err_msg=f"errD step {i + 1}")
        np.testing.assert_allclose(l2_o, l2_t, rtol=0.05,
                                   err_msg=f"errG_l2 step {i + 1}")

    eps_diff = np.concatenate([(a - b).ravel() for a, b in
                               zip(ref_w_px1, ref_w_lua1)])
    assert 0 < np.abs(eps_diff).max() < 10 * opt.lr, \
        f"eps-placement max diff {np.abs(eps_diff).max():.2e}"

    diffs5 = np.concatenate([(a - b).ravel() for a, b in
                             zip(ours_g_weights(state), ref_w_px)])
    assert np.abs(diffs5).max() < 2 * 10 * opt.lr * n_steps


def test_video_step_gradients_match_torch(rng):
    """Video-regime golden: the flagship trainer's gradient blend — masked
    l2 weights lambda (train_vid_weighted.lua:494-497), (1-wtl2) adversarial
    scale, and the GDL quirk (MSE gradient, :524-527) — matches a torch
    replica on the 128-out G / BN-free-head 128-in D."""
    torch.manual_seed(2)
    NC = NC_VID
    LAM, WTGDL = LAM_VID, WTGDL_VID
    opt = Opt(nef=NEF, ngf=NGF, ndf=NDF, nBottleneck=NB, batchSize=2,
              predLen=PL_VID, wtl2=WTL2, weight_nomask=LAM, wtgdl=WTGDL,
              gdlTorchQuirk=True, computeDtype="float32")

    tg, td = _torch_video_nets()
    tg.train(), td.train()

    gen, disc = build_for_regime(opt, "video")
    gp, gs, dp, ds = _share_video_weights_into(tg, td, gen, disc, rng)
    tconvs = [m for m in tg if isinstance(m, (nn.Conv2d, nn.ConvTranspose2d))]
    dconvs = [m for m in td if isinstance(m, nn.Conv2d)]
    enc_names = [f"conv{i}" for i in range(6)]
    dec_names = [f"up{i}" for i in range(6)]

    # shared batch: channel-folded clip + block mask
    rs = np.random.RandomState(7)
    real = rs.rand(2, 128, 128, NC).astype(np.float32) * 2 - 1
    mask = np.zeros((2, 128, 128, 1), np.float32)
    mask[:, 40:90, 30:80] = 1.0
    real_j, mask_j = jnp.asarray(real), jnp.asarray(mask)
    ctx_j = masks.apply_logo_mask(real_j, mask_j, opt.maskValue)

    def loss_fn(gp_, dp_):
        fake, _ = gen.apply(gp_, gs, ctx_j, train=True)
        logit_real, sd1 = disc.apply(dp_, ds, real_j, train=True)
        logit_fake, _ = disc.apply(dp_, sd1, jax.lax.stop_gradient(fake),
                                   train=True)
        loss_d = (losses.bce_with_logits(logit_real, 1.0)
                  + losses.bce_with_logits(logit_fake, 0.0))
        logit_fake_g, _ = disc.apply(jax.lax.stop_gradient(dp_), sd1, fake,
                                     train=True)
        w = jnp.float32(WTL2) * losses.mask_l2_weights(mask_j, LAM)
        loss_g = ((1 - WTL2) * losses.bce_with_logits(logit_fake_g, 1.0)
                  + losses.weighted_mse(fake, real_j, w)
                  + WTGDL * losses.mse(fake, real_j))  # the GDL quirk's grad
        return loss_g + loss_d

    grad_g, grad_d = jax.grad(loss_fn, argnums=(0, 1))(gp, dp)

    # torch reference
    real_t = torch.from_numpy(real.transpose(0, 3, 1, 2))
    ctx_t = torch.from_numpy(np.asarray(ctx_j).transpose(0, 3, 1, 2))
    mask_t = torch.from_numpy(mask.transpose(0, 3, 1, 2))

    fake_t = tg(ctx_t)
    # D's fake pass uses the EXACT jax fake: the two G forwards agree only to
    # ~3e-5 in f32, and LeakyReLU/BN kink flips in D amplify that input noise
    # into O(1e-2) gradient jumps — the fake is detached in fDx anyway, so
    # sharing the array isolates the D math under test from G forward noise.
    fake_detached_t = torch.from_numpy(
        np.asarray(jax.lax.stop_gradient(
            gen.apply(gp, gs, ctx_j, train=True)[0])).transpose(0, 3, 1, 2)
        .copy())
    out_real = td(real_t).view(-1)
    out_fake = td(fake_detached_t).view(-1)
    loss_d_t = (F.binary_cross_entropy_with_logits(
                    out_real, torch.ones_like(out_real))
                + F.binary_cross_entropy_with_logits(
                    out_fake, torch.zeros_like(out_fake)))
    td.zero_grad()
    loss_d_t.backward()
    d_grads_t = [m.weight.grad.detach().numpy().copy() for m in dconvs]

    for p in td.parameters():
        p.requires_grad_(False)
    out_fake_g = td(fake_t).view(-1)
    weights_t = mask_t * (1 - LAM) + LAM
    loss_g_t = ((1 - WTL2) * F.binary_cross_entropy_with_logits(
                    out_fake_g, torch.ones_like(out_fake_g))
                + WTL2 * (weights_t * (fake_t - real_t) ** 2).sum()
                / fake_t.numel()
                + WTGDL * ((fake_t - real_t) ** 2).mean())
    tg.zero_grad()
    loss_g_t.backward()
    g_grads_t = [m.weight.grad.detach().numpy().copy() for m in tconvs]

    for i, name in enumerate(enc_names):
        np.testing.assert_allclose(
            np.asarray(grad_g["enc"][name]["w"]).transpose(3, 2, 0, 1),
            g_grads_t[i], rtol=2e-3, atol=1e-4, err_msg=f"G enc {name}")
    for i, name in enumerate(dec_names):
        np.testing.assert_allclose(
            np.asarray(grad_g["dec"][name]["w"]).transpose(2, 3, 0, 1),
            g_grads_t[6 + i], rtol=2e-3, atol=1e-4, err_msg=f"G dec {name}")
    for i, name in enumerate([f"conv{i}" for i in range(6)]):
        np.testing.assert_allclose(
            np.asarray(grad_d[name]["w"]).transpose(3, 2, 0, 1),
            d_grads_t[i], rtol=2e-3, atol=1e-4, err_msg=f"D {name}")
