"""Context-encoder model zoo: every generator/discriminator variant the
reference defines inline across its six trainers, extracted into builders.

Architecture sources (all verified against the reference Lua):
* encoder ladder + 64-out decoder:      train.lua:87-148
* 128-out video decoder (ngf mid):      train_vid_weighted.lua:171-176
* 128-out logo decoder (ngf/2 mid):     train_logo_withmask.lua:154-158
* wholeim in/out widths:                train_wholeim_input.lua:118-119,195-198,238
* 64-in discriminator:                  train.lua:181-199
* 128-in discriminator (no BN on the
  two leading convs):                   train_vid_weighted.lua:216-227
* conditionAdv parallel-context head:   train.lua:158-180
* noiseGen bottleneck join:             train.lua:109-124
* weight init N(0,0.02)/BN N(1,0.02):   train.lua:58-67

Layout is NHWC (TPU-native); video clips are channel-folded on the LAST axis
(reference folds on axis 1: train_vid_weighted.lua:96).  Discriminators return
LOGITS — the reference ends with nn.Sigmoid + BCECriterion (train.lua:197,207);
we fuse that into a logit-space BCE for numerical stability (same math).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from video_filler_tpu.config import Opt
from video_filler_tpu.ops.layers import (
    Layer,
    batch_norm,
    conv2d,
    conv2d_transpose,
    leaky_relu,
    relu,
    sequential,
    tanh,
)


@dataclasses.dataclass(frozen=True)
class GeneratorSpec:
    nc_in: int
    nc_out: int
    nef: int = 64
    ngf: int = 64
    n_bottleneck: int = 4000
    out_size: int = 128              # 64 (center CE) or 128 (video/logo/wholeim)
    mid_channels: int | None = None  # 64->128 stage width; None = ngf (video),
                                     # logo uses ngf//2
    noise_gen: bool = False
    nz: int = 100
    use_bias: bool = False
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


@dataclasses.dataclass(frozen=True)
class DiscriminatorSpec:
    nc_in: int
    ndf: int = 64
    in_size: int = 64                # 64 (center CE) or 128 (full-image variants)
    condition_adv: bool = False
    nc_ctx: int = 3                  # context channels for conditionAdv
    use_bias: bool = False
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


def _encoder(spec: GeneratorSpec) -> Layer:
    """5x stride-2 4x4 conv ladder + 4x4 valid conv to the bottleneck.

    128² x nc_in -> 1² x nBottleneck (train.lua:87-105). BN absent on the first
    conv, LeakyReLU(0.2) throughout.
    """
    nef, dt, ub = spec.nef, spec.compute_dtype, spec.use_bias
    return sequential(
        ("conv0", conv2d(spec.nc_in, nef, 4, 2, 1, ub, dt)),
        ("lrelu0", leaky_relu(0.2)),
        ("conv1", conv2d(nef, nef, 4, 2, 1, ub, dt)),
        ("bn1", batch_norm(nef)),
        ("lrelu1", leaky_relu(0.2)),
        ("conv2", conv2d(nef, nef * 2, 4, 2, 1, ub, dt)),
        ("bn2", batch_norm(nef * 2)),
        ("lrelu2", leaky_relu(0.2)),
        ("conv3", conv2d(nef * 2, nef * 4, 4, 2, 1, ub, dt)),
        ("bn3", batch_norm(nef * 4)),
        ("lrelu3", leaky_relu(0.2)),
        ("conv4", conv2d(nef * 4, nef * 8, 4, 2, 1, ub, dt)),
        ("bn4", batch_norm(nef * 8)),
        ("lrelu4", leaky_relu(0.2)),
        ("conv5", conv2d(nef * 8, spec.n_bottleneck, 4, 1, 0, ub, dt)),
    )


def _decoder(spec: GeneratorSpec, nz_size: int) -> Layer:
    """Transposed-conv decoder: 1² -> 4² (valid) -> doubling ladder -> Tanh.

    64-out: train.lua:134-148.  128-out adds one mid up-conv stage whose width
    is ngf (video: train_vid_weighted.lua:171) or ngf//2 (logo:
    train_logo_withmask.lua:154).
    """
    ngf, dt, ub = spec.ngf, spec.compute_dtype, spec.use_bias
    layers: list[tuple[str, Layer]] = [
        ("up0", conv2d_transpose(nz_size, ngf * 8, 4, 1, 0, ub, dt)),
        ("bn0", batch_norm(ngf * 8)),
        ("relu0", relu()),
        ("up1", conv2d_transpose(ngf * 8, ngf * 4, 4, 2, 1, ub, dt)),
        ("bn1", batch_norm(ngf * 4)),
        ("relu1", relu()),
        ("up2", conv2d_transpose(ngf * 4, ngf * 2, 4, 2, 1, ub, dt)),
        ("bn2", batch_norm(ngf * 2)),
        ("relu2", relu()),
        ("up3", conv2d_transpose(ngf * 2, ngf, 4, 2, 1, ub, dt)),
        ("bn3", batch_norm(ngf)),
        ("relu3", relu()),
    ]
    if spec.out_size == 64:
        layers += [("up4", conv2d_transpose(ngf, spec.nc_out, 4, 2, 1, ub, dt))]
    elif spec.out_size == 128:
        mid = spec.mid_channels if spec.mid_channels is not None else ngf
        layers += [
            ("up4", conv2d_transpose(ngf, mid, 4, 2, 1, ub, dt)),
            ("bn4", batch_norm(mid)),
            ("relu4", relu()),
            ("up5", conv2d_transpose(mid, spec.nc_out, 4, 2, 1, ub, dt)),
        ]
    else:
        raise ValueError(f"out_size must be 64 or 128, got {spec.out_size}")
    layers += [("tanh", tanh())]
    return sequential(*layers)


def build_generator(spec: GeneratorSpec) -> Layer:
    """Full generator: encoder -> BN+LeakyReLU bottleneck [-> noise join] -> decoder.

    apply(params, state, x, *, train) with x NHWC in [-1,1];
    noise_gen variant takes x=(ctx, z) with z shaped (B,1,1,nz)
    (reference joins on the channel axis at the 1x1 bottleneck, train.lua:109-124).
    """
    enc = _encoder(spec)
    nz_size = spec.n_bottleneck + (spec.nz if spec.noise_gen else 0)
    bott_bn = batch_norm(nz_size)
    bott_act = leaky_relu(0.2)
    dec = _decoder(spec, nz_size)
    noise_conv = (conv2d(spec.nz, spec.nz, 1, 1, 0, spec.use_bias,
                         spec.compute_dtype) if spec.noise_gen else None)

    def init(key):
        k_enc, k_bn, k_dec, k_nz = jax.random.split(key, 4)
        params, state = {}, {}
        params["enc"], state["enc"] = enc.init(k_enc)
        params["bott_bn"], state["bott_bn"] = bott_bn.init(k_bn)
        params["dec"], state["dec"] = dec.init(k_dec)
        if noise_conv is not None:
            params["noise"], _ = noise_conv.init(k_nz)
        return params, state

    def apply(params, state, x, *, train=False):
        new_state = dict(state)
        if spec.noise_gen:
            ctx, z = x
            h, new_state["enc"] = enc.apply(params["enc"], state["enc"], ctx,
                                            train=train)
            zh, _ = noise_conv.apply(params["noise"], {}, z, train=train)
            h = jnp.concatenate([h, zh], axis=-1)
        else:
            h, new_state["enc"] = enc.apply(params["enc"], state["enc"], x,
                                            train=train)
        h, new_state["bott_bn"] = bott_bn.apply(params["bott_bn"],
                                                state["bott_bn"], h, train=train)
        h, _ = bott_act.apply({}, {}, h)
        y, new_state["dec"] = dec.apply(params["dec"], state["dec"], h,
                                        train=train)
        return y, new_state

    return Layer(init, apply)


def _disc_tail(ndf: int, ub: bool, dt) -> list[tuple[str, Layer]]:
    """Common tail from (ndf) x 32² down to a single logit (train.lua:187-196)."""
    return [
        ("conv2", conv2d(ndf, ndf * 2, 4, 2, 1, ub, dt)),
        ("bn2", batch_norm(ndf * 2)),
        ("lrelu2", leaky_relu(0.2)),
        ("conv3", conv2d(ndf * 2, ndf * 4, 4, 2, 1, ub, dt)),
        ("bn3", batch_norm(ndf * 4)),
        ("lrelu3", leaky_relu(0.2)),
        ("conv4", conv2d(ndf * 4, ndf * 8, 4, 2, 1, ub, dt)),
        ("bn4", batch_norm(ndf * 8)),
        ("lrelu4", leaky_relu(0.2)),
        ("conv5", conv2d(ndf * 8, 1, 4, 1, 0, ub, dt)),
    ]


def build_discriminator(spec: DiscriminatorSpec) -> Layer:
    """Patch discriminator; apply returns LOGITS of shape (B,).

    * in_size=64: nc->ndf head (train.lua:183-185).
    * in_size=128: nc->ndf/2->ndf head, both BN-free (train_vid_weighted.lua:216-227).
    * condition_adv: parallel 5x5 heads on ctx(128²)/pred(64², pad 2+32) joined
      on channels (train.lua:158-180); apply takes x=(ctx, pred).
    """
    ndf, dt, ub = spec.ndf, spec.compute_dtype, spec.use_bias
    if spec.condition_adv:
        ctx_head = conv2d(spec.nc_ctx, ndf, 5, 2, 2, ub, dt)
        # Reference pads the 64² pred branch by 2+32 so its feature scale
        # matches the 128² ctx branch (train.lua:166).  The extra 32 is
        # hoisted to an explicit zero-pad: identical math, and it avoids an
        # XLA space-to-batch bug with huge conv padding.
        pred_conv = conv2d(spec.nc_in, ndf, 5, 2, 2, ub, dt)
        pred_head = Layer(
            pred_conv.init,
            lambda p, s, x, *, train=False: pred_conv.apply(
                p, s, jnp.pad(x, ((0, 0), (32, 32), (32, 32), (0, 0))),
                train=train))
        join = sequential(
            ("lrelu0", leaky_relu(0.2)),
            ("conv1", conv2d(ndf * 2, ndf, 4, 2, 1, ub, dt)),
            ("bn1", batch_norm(ndf)),
            ("lrelu1", leaky_relu(0.2)),
            *_disc_tail(ndf, ub, dt),
        )

        def init(key):
            k_ctx, k_pred, k_join = jax.random.split(key, 3)
            params = {"ctx": ctx_head.init(k_ctx)[0],
                      "pred": pred_head.init(k_pred)[0]}
            params["join"], state = join.init(k_join)
            return params, {"join": state}

        def apply(params, state, x, *, train=False):
            ctx, pred = x
            hc, _ = ctx_head.apply(params["ctx"], {}, ctx, train=train)
            hp, _ = pred_head.apply(params["pred"], {}, pred, train=train)
            h = jnp.concatenate([hc, hp], axis=-1)
            y, js = join.apply(params["join"], state["join"], h, train=train)
            return y.reshape(y.shape[0]), {"join": js}

        return Layer(init, apply)

    if spec.in_size == 64:
        head = [
            ("conv1", conv2d(spec.nc_in, ndf, 4, 2, 1, ub, dt)),
            ("lrelu1", leaky_relu(0.2)),
        ]
    elif spec.in_size == 128:
        head = [
            ("conv0", conv2d(spec.nc_in, ndf // 2, 4, 2, 1, ub, dt)),
            ("lrelu0", leaky_relu(0.2)),
            ("conv1", conv2d(ndf // 2, ndf, 4, 2, 1, ub, dt)),
            ("lrelu1", leaky_relu(0.2)),
        ]
    else:
        raise ValueError(f"in_size must be 64 or 128, got {spec.in_size}")
    net = sequential(*head, *_disc_tail(ndf, ub, dt))

    def init(key):
        return net.init(key)

    def apply(params, state, x, *, train=False):
        y, s = net.apply(params, state, x, train=train)
        return y.reshape(y.shape[0]), s

    return Layer(init, apply)


def specs_for_regime(opt: Opt, regime: str) -> tuple[GeneratorSpec, DiscriminatorSpec]:
    """Map a config + regime name to (GeneratorSpec, DiscriminatorSpec).

    Regimes mirror the reference trainers:
      center  -> train.lua            (64² center prediction)
      video   -> train_vid_weighted / train_mycrit / train_deepernet
      logo    -> train_logo_withmask
      wholeim -> train_wholeim_input
    """
    common = dict(nef=opt.nef, ngf=opt.ngf, n_bottleneck=opt.nBottleneck,
                  noise_gen=opt.noiseGen, nz=opt.nz, use_bias=opt.useBias,
                  dtype=opt.computeDtype)
    dcommon = dict(ndf=opt.ndf, use_bias=opt.useBias, dtype=opt.computeDtype)
    if regime == "center":
        g = GeneratorSpec(nc_in=opt.nc, nc_out=opt.nc, out_size=64, **common)
        d = DiscriminatorSpec(nc_in=opt.nc, in_size=64,
                              condition_adv=opt.conditionAdv, nc_ctx=opt.nc,
                              **dcommon)
    elif regime == "video":
        nc = opt.nc_total
        g = GeneratorSpec(nc_in=nc, nc_out=nc, out_size=128, **common)
        d = DiscriminatorSpec(nc_in=nc, in_size=128, **dcommon)
    elif regime == "logo":
        g = GeneratorSpec(nc_in=opt.nc, nc_out=opt.nc, out_size=128,
                          mid_channels=opt.ngf // 2, **common)
        d = DiscriminatorSpec(nc_in=opt.nc, in_size=128, **dcommon)
    elif regime == "wholeim":
        g = GeneratorSpec(nc_in=opt.nc_wholeim_in, nc_out=opt.nc_wholeim_out,
                          out_size=128, **common)
        d = DiscriminatorSpec(nc_in=opt.nc_wholeim_out, in_size=128, **dcommon)
    else:
        raise ValueError(f"unknown regime {regime!r}")
    return g, d
