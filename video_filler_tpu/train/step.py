"""The fused GAN train step — fDx + fGx + both Adam updates as ONE XLA program.

The reference alternates two optim.adam closures per batch (train.lua:421-424):
fDx builds D's gradient from a real pass and a fake pass (train.lua:278-350),
fGx reuses D's fake-pass output and blends the adversarial gradient with a
(ring-/mask-)weighted L2 gradient (train.lua:353-409).  Here the whole thing is
a single jitted function: one G forward, two D forwards (real/fake), one joint
backward, two Adam updates — XLA fuses preprocessing, conv chains, losses and
optimizer math, and under a sharded mesh inserts the ICI all-reduces.

Faithfulness notes:
* One batch per step, used by both updates — same as the reference (fGx reuses
  fDx's batch and fake, train.lua:359-365).
* The reference updates D *before* computing G's gradient, but G's backward
  then mixes D's *old* activations with *new* weights (Torch caches
  activations; see SURVEY §2.7.4).  We compute both gradients at the current
  (θG, θD) and apply both updates — the clean simultaneous form; documented
  divergence, not a behavior to replicate.
* Conv biases: the reference zeroes every conv bias at the top of both
  closures (train.lua:279-280,354-355), making them permanently zero.  We build
  bias-free convs (config `useBias=False`) — identical math, no dead params.
* G's learning rate is 10x D's iff 0<wtl2<1 (train.lua:218-222).
* Adam: optim.adam semantics (b1=opt.beta1, b2=0.999, eps=1e-8); Torch adds
  eps to sqrt(v) before bias correction, optax after — difference O(eps),
  documented.
* GDL: correct form by default; `gdlTorchQuirk=True` reproduces the reference
  bug where the GDL term backpropagates an MSE gradient
  (train_vid_weighted.lua:524-525) while still logging the GDL forward value.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from video_filler_tpu.config import Opt
from video_filler_tpu.models import build_for_regime
from video_filler_tpu.ops import image as image_ops
from video_filler_tpu.ops import losses, masks
from video_filler_tpu.ops.layers3d import unfold_time


_METRIC_KEYS = ("errD", "errD_real", "errD_fake", "errG", "errG_l2",
                "errG_gdl", "errG_total")


class TrainState(NamedTuple):
    params_g: Any
    params_d: Any
    state_g: Any     # BatchNorm running statistics
    state_d: Any
    opt_g: Any
    opt_d: Any
    step: jax.Array


def _adam_lowmem(lr: float, b1: float, b2: float = 0.999,
                 eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam with bfloat16 moment storage (math in f32 registers).

    The two 32.8M-param bottleneck weights put the f32 Adam state on the HBM
    roofline (~26% of the fused step, measured by a SGD ablation on v5e);
    bf16 mu/nu halve that state's traffic — measured +8-14% step throughput.
    Trade-off: ~2^-8 relative rounding on the moments perturbs trajectories
    (visibly after ~100 steps), so this is OPT-IN (`adamMomentsBf16`), never
    the default; the torch-golden trajectory tests pin the f32 path.
    """

    def init(params):
        z = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.bfloat16),
                         params)
        return {"mu": z, "nu": jax.tree.map(jnp.copy, z),
                "count": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None):
        count = state["count"] + 1
        mu = jax.tree.map(
            lambda m, g: (b1 * m.astype(jnp.float32)
                          + (1 - b1) * g).astype(jnp.bfloat16),
            state["mu"], grads)
        nu = jax.tree.map(
            lambda v, g: (b2 * v.astype(jnp.float32)
                          + (1 - b2) * jnp.square(g)).astype(jnp.bfloat16),
            state["nu"], grads)
        c = count.astype(jnp.float32)
        bc1, bc2 = 1 - b1 ** c, 1 - b2 ** c
        upd = jax.tree.map(
            lambda m, v: -lr * (m.astype(jnp.float32) / bc1)
            / (jnp.sqrt(v.astype(jnp.float32) / bc2) + eps),
            mu, nu)
        return upd, {"mu": mu, "nu": nu, "count": count}

    return optax.GradientTransformation(init, update)


def _optimizers(opt: Opt):
    """Two Adams; G LR is 10x D's when 0<wtl2<1 (train.lua:218-226)."""
    g_lr = opt.lr * 10.0 if 0.0 < opt.wtl2 < 1.0 else opt.lr
    if opt.adamMomentsBf16:
        adam = lambda lr: _adam_lowmem(lr, opt.beta1)
    else:
        adam = lambda lr: optax.adam(lr, b1=opt.beta1, b2=0.999, eps=1e-8)
    return adam(g_lr), adam(opt.lr)


def init_train_state(key: jax.Array, opt: Opt, regime: str) -> TrainState:
    gen, disc = build_for_regime(opt, regime)
    kg, kd = jax.random.split(key)
    params_g, state_g = gen.init(kg)
    params_d, state_d = disc.init(kd)
    tx_g, tx_d = _optimizers(opt)
    return TrainState(params_g, params_d, state_g, state_d,
                      tx_g.init(params_g), tx_d.init(params_d),
                      jnp.zeros((), jnp.int32))


def _draw_noise(key, opt: Opt, batch: int):
    """fDx regenerates noise every step (train.lua:319-323)."""
    shape = (batch, 1, 1, opt.nz)
    if opt.noisetype == "uniform":
        return jax.random.uniform(key, shape, minval=-1.0, maxval=1.0)
    return jax.random.normal(key, shape)


def make_train_step(opt: Opt, regime: str, with_init: bool = False,
                    sp_mesh=None):
    """Build the fused step for a regime ('center'|'video'|'logo'|'wholeim').

    Returns step(state, batch, key[, init_net]) -> (state, metrics).
    sp_mesh (video3d only): run G/D with sequence-parallel temporal convs
    over a ('data','seq') mesh (parallel/temporal.py) — same math, T-sharded.

    Batch contract (all NHWC float in [-1,1] unless noted):
      center : {'real': (B,fs,fs,nc)}
      video  : {'real': (B,fs,fs,nc*predLen), 'mask': (B,fs,fs,1 or C) {0,1}}
      logo   : {'real': gt, 'masked': masked input}
      wholeim: {'real': (B,fs,fs,nc*4) target patches,
                'mask': same-shape {0,1},
                'masked': (B,fs,fs,nc*arrh*arrw) input patch array}
    """
    if opt.conditionAdv and regime != "center":
        # Only the center trainer builds the conditional D (specs_for_regime);
        # wrapping another regime's D input in a (ctx, x) tuple would crash at
        # trace time with an opaque tuple-attribute error.  The reference
        # forces conditionAdv off in all M-variants (train_logo_withmask
        # .lua:43); reject it loudly here.
        raise ValueError(
            f"conditionAdv is only supported for regime=center, not "
            f"{regime!r} (the reference forces it off in its other trainers)")
    gen, disc = build_for_regime(opt, regime, sp_mesh=sp_mesh)
    tx_g, tx_d = _optimizers(opt)
    wtl2 = float(opt.wtl2)
    adv_coef = (1.0 - wtl2) if 0.0 < wtl2 < 1.0 else 1.0
    lam = float(opt.weight_nomask)

    if with_init:
        if regime not in ("video", "video3d"):
            # The cascade composites netI's prediction INSIDE the mask
            # (train_mycrit.lua:402-405); only the video trainers define
            # withInit in the reference (train_mycrit/vid_weighted), and the
            # other regimes' ctx/mask shapes don't compose.
            raise ValueError(
                "withInit requires a video regime (video/video3d), "
                f"not {regime!r}")
        # G topology for netI; under SP it shares the T-sharded convs so the
        # cascade stays on the same mesh layout.
        init_gen = build_for_regime(opt, regime, sp_mesh=sp_mesh)[0]

    def _prepare(batch, key):
        """Regime-specific (ctx, d_real_input, target, l2_weights, mask)."""
        if regime == "center":
            real = batch["real"]
            real_center = masks.extract_center(real)
            ctx = masks.center_mask_fill(real, opt.overlapPred)
            if opt.overlapPred > 0:
                w = losses.overlap_l2_weights(
                    (real_center.shape[1], real_center.shape[2]),
                    opt.overlapPred, wtl2)[None]
            else:
                w = jnp.float32(wtl2)
            return ctx, real_center, real_center, w, None
        if regime in ("video", "video3d"):
            # video3d: same semantics on (B, T, H, W, C) clips; the mask
            # broadcasts over the temporal axis.
            real, mask = batch["real"], batch["mask"]
            ctx = masks.apply_logo_mask(real, mask, opt.maskValue)
            w = jnp.float32(wtl2) * losses.mask_l2_weights(
                mask.astype(jnp.float32), lam)
            return ctx, real, real, w, mask
        if regime == "logo":
            real = batch["real"]
            ctx = batch["masked"]
            return ctx, real, real, jnp.float32(wtl2), None
        if regime == "wholeim":
            real, mask = batch["real"], batch["mask"]
            ctx = batch["masked"]
            w = jnp.float32(wtl2) * losses.mask_l2_weights(
                mask.astype(jnp.float32), lam)
            return ctx, real, real, w, mask
        raise ValueError(regime)

    def step(state: TrainState, batch, key, init_net=None):
        k_noise, k_prep = jax.random.split(key)
        ctx, d_real, target, l2_w, mask = _prepare(batch, k_prep)

        if with_init:
            # Initializer cascade: composite netI's prediction into the masked
            # region of the context before G sees it (train_mycrit.lua:402-405).
            init_params, init_state = init_net
            fake_init, _ = init_gen.apply(init_params, init_state, ctx,
                                          train=False)
            ctx = masks.fill_in(ctx, mask, fake_init)

        noise = _draw_noise(k_noise, opt, ctx.shape[0]) if opt.noiseGen else None

        # remat=1: checkpoint each NETWORK apply (G once, D per pass) so
        # only the inter-network tensors (fake, logits, BN states) cross the
        # fwd->bwd boundary.  MEASURED (scripts/measure_remat.py): no
        # temp-memory win for this convnet family at ANY granularity tried
        # (whole-loss / per-network / per-stage all read equal-or-worse temp
        # at +10-20% FLOPs) — conv feature maps must live at checkpoint
        # boundaries anyway and XLA already remats the cheap elementwise
        # chains.  The flag stays opt-in for other backends/model widths;
        # the measured memory levers here are gradAccum and batch size
        # (BASELINE.md).
        if opt.remat:
            g_apply = jax.checkpoint(
                lambda p, s, x: gen.apply(p, s, x, train=True))
            d_apply = jax.checkpoint(
                lambda p, s, x: disc.apply(p, s, x, train=True))
        else:
            g_apply = lambda p, s, x: gen.apply(p, s, x, train=True)
            d_apply = lambda p, s, x: disc.apply(p, s, x, train=True)

        def loss_fn(params_g, params_d, state_g, state_d, prep):
            ctx, d_real, target, l2_w, mask, noise = (
                prep["ctx"], prep["d_real"], prep["target"], prep["l2_w"],
                prep.get("mask"), prep.get("noise"))
            g_in = (ctx, noise) if opt.noiseGen else ctx
            fake, new_state_g = g_apply(params_g, state_g, g_in)
            # Hard composite — only masked pixels come from G, so gradients
            # flow only through the hole.  vid_weighted composites at
            # weight_nomask==0 (train_vid_weighted.lua:429-434); mycrit
            # whenever weight_nomask<1 (train_mycrit.lua:431-437,
            # opt.compositeLtOne).
            composite = (lam == 0.0) or (opt.compositeLtOne and lam < 1.0)
            if regime in ("video", "video3d", "wholeim") and composite:
                d_fake = masks.fill_in(target, mask, fake)
            else:
                d_fake = fake

            def d_in(x):
                return (ctx, x) if opt.conditionAdv else x

            # --- D loss: real pass then fake pass, BN stats updated in order
            # (train.lua:299-345). stop_gradient(fake): D's update must not
            # backprop into G.
            logit_real, sd1 = d_apply(params_d, state_d, d_in(d_real))
            logit_fake, new_state_d = d_apply(
                params_d, sd1, d_in(jax.lax.stop_gradient(d_fake)))
            err_d_real = losses.bce_with_logits(logit_real, 1.0)
            err_d_fake = losses.bce_with_logits(logit_fake, 0.0)
            loss_d = err_d_real + err_d_fake

            # --- G adversarial term: the reference reuses D's fake-pass output
            # (train.lua:365); same forward here with D's params frozen.
            logit_fake_g, _ = d_apply(
                jax.lax.stop_gradient(params_d), sd1, d_in(d_fake))
            err_g = losses.bce_with_logits(logit_fake_g, 1.0)
            loss_g = adv_coef * err_g
            err_g_l2 = jnp.float32(0.0)
            if wtl2 != 0.0:
                err_g_l2 = losses.mse(d_fake, target)  # logged unweighted
                if opt.usePallasLoss:
                    from video_filler_tpu.ops.pallas import (
                        fused_weighted_mse,
                        pallas_supported,
                    )
                    if pallas_supported(d_fake.shape):
                        w_full = jnp.broadcast_to(
                            jnp.asarray(l2_w, jnp.float32), d_fake.shape)
                        loss_g = loss_g + fused_weighted_mse(
                            d_fake, target, w_full,
                            jax.default_backend() != "tpu")
                    else:
                        loss_g = loss_g + losses.weighted_mse(d_fake, target,
                                                              l2_w)
                else:
                    loss_g = loss_g + losses.weighted_mse(d_fake, target, l2_w)
            err_g_gdl = jnp.float32(0.0)
            if opt.wtgdl != 0.0:
                gdl_val = losses.gdl(d_fake, target)
                if opt.gdlTorchQuirk:
                    # Reference bug: GDL forward logged, MSE gradient applied
                    # (train_vid_weighted.lua:524-525).
                    loss_g = loss_g + opt.wtgdl * (
                        losses.mse(d_fake, target)
                        - jax.lax.stop_gradient(losses.mse(d_fake, target))
                        + jax.lax.stop_gradient(gdl_val))
                else:
                    loss_g = loss_g + opt.wtgdl * gdl_val
                err_g_gdl = gdl_val

            aux = dict(new_state_g=new_state_g, new_state_d=new_state_d,
                       errD=loss_d, errD_real=err_d_real, errD_fake=err_d_fake,
                       errG=err_g, errG_l2=err_g_l2, errG_gdl=err_g_gdl,
                       # the ACTUAL optimized G objective (weighted L2 incl.
                       # the overlap ring / mask-blend weights; quirk path
                       # forward-evaluates to the GDL value) — not a
                       # reconstruction from the unweighted parts
                       errG_total=loss_g)
            # loss_d depends only on params_d (fake is stopped); loss_g only on
            # params_g (D params stopped) — one backward yields both gradients.
            return loss_g + loss_d, aux

        prep = {"ctx": ctx, "d_real": d_real, "target": target, "l2_w": l2_w}
        if mask is not None:
            prep["mask"] = mask
        if noise is not None:
            prep["noise"] = noise
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        n_micro = int(opt.gradAccum)

        if n_micro <= 1:
            (_, aux), (grad_g, grad_d) = grad_fn(
                state.params_g, state.params_d, state.state_g, state.state_d,
                prep)
            new_state_g, new_state_d = aux["new_state_g"], aux["new_state_d"]
            metrics = {k: aux[k] for k in _METRIC_KEYS}
        else:
            # Gradient accumulation: lax.scan the forward+backward over
            # gradAccum microbatches (BN running stats chain through the
            # carry; batch statistics are per-microbatch — standard
            # accumulation semantics), then one Adam update per net on the
            # averaged gradients.  Peak activation memory drops ~n_micro x;
            # the optimizer/weight traffic stays once per step.
            b = ctx.shape[0]
            if b % n_micro != 0:
                raise ValueError(
                    f"batchSize {b} must divide by gradAccum {n_micro}")
            dyn = {k2: v for k2, v in prep.items()
                   if getattr(v, "ndim", 0) > 0 and v.shape[0] == b}
            static = {k2: v for k2, v in prep.items() if k2 not in dyn}
            xs = {k2: v.reshape((n_micro, b // n_micro) + v.shape[1:])
                  for k2, v in dyn.items()}

            def body(carry, mb):
                sg, sd, acc_g, acc_d, acc_m = carry
                (_, aux), (gg, gd) = grad_fn(state.params_g, state.params_d,
                                             sg, sd, {**static, **mb})
                return ((aux["new_state_g"], aux["new_state_d"],
                         jax.tree.map(jnp.add, acc_g, gg),
                         jax.tree.map(jnp.add, acc_d, gd),
                         {k2: acc_m[k2] + aux[k2] for k2 in acc_m}), None)

            carry0 = (state.state_g, state.state_d,
                      jax.tree.map(jnp.zeros_like, state.params_g),
                      jax.tree.map(jnp.zeros_like, state.params_d),
                      {k2: jnp.float32(0.0) for k2 in _METRIC_KEYS})
            (new_state_g, new_state_d, sum_g, sum_d, sum_m), _ = \
                jax.lax.scan(body, carry0, xs)
            inv = 1.0 / n_micro
            grad_g = jax.tree.map(lambda g: g * inv, sum_g)
            grad_d = jax.tree.map(lambda g: g * inv, sum_d)
            metrics = {k2: v * inv for k2, v in sum_m.items()}

        upd_g, opt_g = tx_g.update(grad_g, state.opt_g, state.params_g)
        upd_d, opt_d = tx_d.update(grad_d, state.opt_d, state.params_d)
        new_state = TrainState(
            optax.apply_updates(state.params_g, upd_g),
            optax.apply_updates(state.params_d, upd_d),
            new_state_g, new_state_d,
            opt_g, opt_d, state.step + 1)
        return new_state, metrics

    return step


def make_preprocess(opt: Opt, regime: str):
    """Device-side preprocessing: host uint8 batch dict → step batch, fused
    into the train-step jit.

    The host pipeline (data/pipeline.py) only decodes/crops; the donkeys'
    flip/normalize/mask-synthesis work (data/donkey_folder.lua:70-88,
    datavid/donkey_folder.lua:138-186) happens here on device.  Signature:
    ``preprocess(host_batch: dict, key) -> step batch``.
    """

    def center(batch, key):
        """batch['raw']: (B, H, W, nc) uint8, H,W >= fineSize."""
        k_crop, k_flip = jax.random.split(key)
        x = batch["raw"]
        if x.shape[1] != opt.fineSize or x.shape[2] != opt.fineSize:
            x = image_ops.random_crop(k_crop, x, opt.fineSize)
        x = image_ops.normalize_uint8(x)
        x = image_ops.random_hflip(k_flip, x)
        return {"real": x}

    def video(batch, key):
        """batch['raw']: (B, H, W, nc*predLen) uint8 channel-folded clip;
        batch['mask']: (B, H, W, 1) (or unbatched) uint8 {0,1} cropped mask.
        Default donkey: empty mask crops fall back to random blocks, and the
        flip is applied to clip and mask together
        (datavid/donkey_folder.lua:161-180).  donkey_file=...norandblk...:
        no random-block fallback, and only the gt clip is flipped — the mask
        stays frame-fixed, so the masked region covers different content on
        flipped samples (donkey_folder_norandblk.lua:141-158)."""
        k_crop, k_blk, k_flip = jax.random.split(key, 3)
        raw, mask = batch["raw"], batch["mask"]
        b = raw.shape[0]
        if mask.ndim == 3:
            mask = jnp.broadcast_to(mask[None], (b,) + mask.shape)
        if raw.shape[1] != opt.fineSize or raw.shape[2] != opt.fineSize:
            both = jnp.concatenate([raw.astype(jnp.uint8),
                                    mask.astype(jnp.uint8)], axis=-1)
            both = image_ops.random_crop(k_crop, both, opt.fineSize)
            raw, mask = both[..., :-1], both[..., -1:]
        x = image_ops.normalize_uint8(raw)
        if opt.noRandBlk:
            m = mask.astype(jnp.float32)
            x = image_ops.random_hflip(k_flip, x)  # gt only; mask unflipped
        else:
            m = masks.mask_or_random_block(k_blk, mask.astype(jnp.float32))
            x, m = image_ops.random_hflip(k_flip, x, 0.5, m)
        return {"real": x, "mask": m}

    def logo(batch, key):
        """Masked/gt pairs share the flip (donkey_folder_logo.lua:91-98)."""
        xm = image_ops.normalize_uint8(batch["raw_masked"])
        xg = image_ops.normalize_uint8(batch["raw_gt"])
        xm, xg = image_ops.random_hflip(key, xm, 0.5, xg)
        return {"masked": xm, "real": xg}

    def wholeim(batch, key):
        """Patch arrays arrive pre-sliced (flip already applied host-side,
        before slicing — donkey_wholeim.lua:177-181); just normalize."""
        return {"masked": image_ops.normalize_uint8(batch["raw_masked"]),
                "real": image_ops.normalize_uint8(batch["raw_real"]),
                "mask": batch["mask"].astype(jnp.float32)}

    def video3d(batch, key):
        """video preprocess, then unfold channels to the temporal axis:
        real (B,T,H,W,C); the (B,H,W,1) mask gains a broadcast T axis."""
        b2 = video(batch, key)
        return {"real": unfold_time(b2["real"], opt.predLen),
                "mask": b2["mask"][:, None]}

    return {"center": center, "video": video, "logo": logo,
            "wholeim": wholeim, "video3d": video3d}[regime]
