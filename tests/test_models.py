"""Shape/variant tests for the model zoo against the reference architectures
(train.lua:87-199 and the per-trainer deltas)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_filler_tpu.config import Opt
from video_filler_tpu.models import (
    DiscriminatorSpec,
    GeneratorSpec,
    build_discriminator,
    build_generator,
    specs_for_regime,
)

DT = "float32"


def test_generator_ce64_shapes(rng):
    spec = GeneratorSpec(nc_in=3, nc_out=3, n_bottleneck=100, out_size=64,
                         dtype=DT)
    gen = build_generator(spec)
    params, state = gen.init(rng)
    x = jnp.zeros((2, 128, 128, 3))
    y, _ = gen.apply(params, state, x, train=True)
    assert y.shape == (2, 64, 64, 3)
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh output


def test_generator_video128_shapes(rng):
    """predLen frames fold into channels (train_vid_weighted.lua:96)."""
    nc = 3 * 4
    spec = GeneratorSpec(nc_in=nc, nc_out=nc, n_bottleneck=4000, out_size=128,
                         dtype=DT)
    gen = build_generator(spec)
    params, state = gen.init(rng)
    y, _ = gen.apply(params, state, jnp.zeros((1, 128, 128, nc)), train=True)
    assert y.shape == (1, 128, 128, nc)


def test_generator_logo_mid_channels(rng):
    """Logo decoder narrows to ngf/2 at 64² (train_logo_withmask.lua:154-158)."""
    spec = GeneratorSpec(nc_in=3, nc_out=3, ngf=64, n_bottleneck=4000,
                         out_size=128, mid_channels=32, dtype=DT)
    gen = build_generator(spec)
    params, _ = gen.init(rng)
    assert params["dec"]["up4"]["w"].shape == (4, 4, 64, 32)
    assert params["dec"]["up5"]["w"].shape == (4, 4, 32, 3)


def test_generator_noise_gen(rng):
    spec = GeneratorSpec(nc_in=3, nc_out=3, n_bottleneck=100, out_size=64,
                         noise_gen=True, nz=100, dtype=DT)
    gen = build_generator(spec)
    params, state = gen.init(rng)
    ctx = jnp.zeros((2, 128, 128, 3))
    z = jnp.zeros((2, 1, 1, 100))
    y, _ = gen.apply(params, state, (ctx, z), train=True)
    assert y.shape == (2, 64, 64, 3)
    # bottleneck BN covers nBottleneck+nz channels (train.lua:121)
    assert params["bott_bn"]["gamma"].shape == (200,)


def test_discriminator_64(rng):
    disc = build_discriminator(DiscriminatorSpec(nc_in=3, in_size=64, dtype=DT))
    params, state = disc.init(rng)
    logits, _ = disc.apply(params, state, jnp.zeros((5, 64, 64, 3)), train=True)
    assert logits.shape == (5,)


def test_discriminator_128_head_structure(rng):
    """128-in head: nc->ndf/2->ndf, both WITHOUT BatchNorm
    (train_vid_weighted.lua:216-227)."""
    disc = build_discriminator(DiscriminatorSpec(nc_in=12, in_size=128, ndf=64,
                                                 dtype=DT))
    params, state = disc.init(rng)
    assert params["conv0"]["w"].shape == (4, 4, 12, 32)
    assert params["conv1"]["w"].shape == (4, 4, 32, 64)
    assert "bn0" not in params and "bn1" not in params
    logits, _ = disc.apply(params, state, jnp.zeros((2, 128, 128, 12)),
                           train=True)
    assert logits.shape == (2,)


def test_discriminator_condition_adv(rng):
    disc = build_discriminator(DiscriminatorSpec(
        nc_in=3, in_size=64, condition_adv=True, nc_ctx=3, dtype=DT))
    params, state = disc.init(rng)
    ctx = jnp.zeros((2, 128, 128, 3))
    pred = jnp.zeros((2, 64, 64, 3))
    logits, _ = disc.apply(params, state, (ctx, pred), train=True)
    assert logits.shape == (2,)


@pytest.mark.parametrize("regime,gin,gout,din", [
    ("center", 3, 3, 3),
    ("video", 12, 12, 12),
    ("logo", 3, 3, 3),
    ("wholeim", 27, 12, 12),
])
def test_specs_for_regime(regime, gin, gout, din):
    opt = Opt(predLen=4 if regime == "video" else 1, computeDtype=DT)
    g, d = specs_for_regime(opt, regime)
    assert g.nc_in == gin and g.nc_out == gout
    assert d.nc_in == din
    assert g.out_size == (64 if regime == "center" else 128)
    assert d.in_size == (64 if regime == "center" else 128)


def test_wholeim_end_to_end_shapes(rng):
    """27-channel 3x3 patch array in, 12-channel 2x2 corner out
    (train_wholeim_input.lua:118-119)."""
    opt = Opt(nef=16, ngf=16, ndf=16, nBottleneck=64, computeDtype=DT)
    gspec, dspec = specs_for_regime(opt, "wholeim")
    gen, disc = build_generator(gspec), build_discriminator(dspec)
    gp, gs = gen.init(rng)
    dp, ds = disc.init(jax.random.PRNGKey(1))
    y, _ = gen.apply(gp, gs, jnp.zeros((1, 128, 128, 27)), train=True)
    assert y.shape == (1, 128, 128, 12)
    logits, _ = disc.apply(dp, ds, y, train=True)
    assert logits.shape == (1,)


def test_generator_param_count_vs_torch_center():
    """Cross-check total parameter count against an equivalent torch build of
    the train.lua:87-148 architecture (bias-free, as the reference's biases
    are permanently zeroed)."""
    import torch.nn as nn

    nef = ngf = 64
    nb, nc = 100, 3
    enc = nn.Sequential(
        nn.Conv2d(nc, nef, 4, 2, 1, bias=False), nn.LeakyReLU(0.2),
        nn.Conv2d(nef, nef, 4, 2, 1, bias=False), nn.BatchNorm2d(nef),
        nn.LeakyReLU(0.2),
        nn.Conv2d(nef, nef * 2, 4, 2, 1, bias=False), nn.BatchNorm2d(nef * 2),
        nn.LeakyReLU(0.2),
        nn.Conv2d(nef * 2, nef * 4, 4, 2, 1, bias=False),
        nn.BatchNorm2d(nef * 4), nn.LeakyReLU(0.2),
        nn.Conv2d(nef * 4, nef * 8, 4, 2, 1, bias=False),
        nn.BatchNorm2d(nef * 8), nn.LeakyReLU(0.2),
        nn.Conv2d(nef * 8, nb, 4, bias=False),
        nn.BatchNorm2d(nb), nn.LeakyReLU(0.2),
        nn.ConvTranspose2d(nb, ngf * 8, 4, bias=False),
        nn.BatchNorm2d(ngf * 8), nn.ReLU(),
        nn.ConvTranspose2d(ngf * 8, ngf * 4, 4, 2, 1, bias=False),
        nn.BatchNorm2d(ngf * 4), nn.ReLU(),
        nn.ConvTranspose2d(ngf * 4, ngf * 2, 4, 2, 1, bias=False),
        nn.BatchNorm2d(ngf * 2), nn.ReLU(),
        nn.ConvTranspose2d(ngf * 2, ngf, 4, 2, 1, bias=False),
        nn.BatchNorm2d(ngf), nn.ReLU(),
        nn.ConvTranspose2d(ngf, nc, 4, 2, 1, bias=False), nn.Tanh(),
    )
    torch_count = sum(p.numel() for p in enc.parameters())

    spec = GeneratorSpec(nc_in=nc, nc_out=nc, n_bottleneck=nb, out_size=64,
                         dtype=DT)
    params, _ = build_generator(spec).init(jax.random.PRNGKey(0))
    ours = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert ours == torch_count


def test_condition_adv_forward_matches_torch(rng):
    """The conditionAdv head's hoisted-pad formulation (explicit 32-pad +
    pad-2 conv, context_encoder.py:214-223) must equal the reference's
    single pad-34 conv (train.lua:166) — verified against a torch replica
    of the whole dual-head discriminator, eval mode."""
    import torch
    import torch.nn as nn

    torch.manual_seed(4)
    NDF = 8
    ctx_head_t = nn.Conv2d(3, NDF, 5, 2, 2, bias=False)
    pred_head_t = nn.Conv2d(3, NDF, 5, 2, 34, bias=False)  # 2 + 32
    join_t = nn.Sequential(
        nn.LeakyReLU(0.2),
        nn.Conv2d(NDF * 2, NDF, 4, 2, 1, bias=False), nn.BatchNorm2d(NDF),
        nn.LeakyReLU(0.2),
        nn.Conv2d(NDF, NDF * 2, 4, 2, 1, bias=False),
        nn.BatchNorm2d(NDF * 2), nn.LeakyReLU(0.2),
        nn.Conv2d(NDF * 2, NDF * 4, 4, 2, 1, bias=False),
        nn.BatchNorm2d(NDF * 4), nn.LeakyReLU(0.2),
        nn.Conv2d(NDF * 4, NDF * 8, 4, 2, 1, bias=False),
        nn.BatchNorm2d(NDF * 8), nn.LeakyReLU(0.2),
        nn.Conv2d(NDF * 8, 1, 4, 1, 0, bias=False))
    for m in (ctx_head_t, pred_head_t, join_t):
        m.eval()

    disc = build_discriminator(DiscriminatorSpec(
        nc_in=3, in_size=64, condition_adv=True, nc_ctx=3, ndf=NDF,
        dtype=DT))
    params, state = disc.init(rng)

    def cw(m):
        return jnp.asarray(m.weight.detach().numpy().transpose(2, 3, 1, 0))

    params["ctx"] = {"w": cw(ctx_head_t)}
    params["pred"] = {"w": cw(pred_head_t)}
    jconvs = [f"conv{i}" for i in range(1, 6)]
    jbns = ["bn1", "bn2", "bn3", "bn4"]
    tconvs = [m for m in join_t if isinstance(m, nn.Conv2d)]
    tbns = [m for m in join_t if isinstance(m, nn.BatchNorm2d)]
    for name, m in zip(jconvs, tconvs):
        params["join"][name]["w"] = cw(m)
    for name, m in zip(jbns, tbns):
        params["join"][name] = {
            "gamma": jnp.asarray(m.weight.detach().numpy()),
            "beta": jnp.asarray(m.bias.detach().numpy())}
        state["join"][name] = {
            "mean": jnp.asarray(m.running_mean.numpy()),
            "var": jnp.asarray(m.running_var.numpy())}

    rs = np.random.RandomState(11)
    ctx = rs.rand(2, 128, 128, 3).astype(np.float32) * 2 - 1
    pred = rs.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    logits, _ = disc.apply(params, state, (jnp.asarray(ctx),
                                           jnp.asarray(pred)), train=False)

    with torch.no_grad():
        hc = ctx_head_t(torch.from_numpy(ctx.transpose(0, 3, 1, 2).copy()))
        hp = pred_head_t(torch.from_numpy(pred.transpose(0, 3, 1, 2).copy()))
        ref = join_t(torch.cat([hc, hp], dim=1)).view(-1).numpy()

    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-4, atol=1e-5)
