"""Loss functions reproducing the reference training criteria as scalar losses.

The reference hand-blends *gradients* inside its fGx closure (train.lua:376-401)
rather than composing scalar losses.  Every blend is re-derived here as a single
scalar objective whose autodiff gradient equals the reference's hand-built
gradient exactly, so the whole G step stays one fused XLA program:

* BCE:        nn.BCECriterion on sigmoid outputs (train.lua:207) == logit-space
              sigmoid BCE here (numerically stable, same math).
* MSE:        nn.MSECriterion (mean over ALL elements; backward = 2(x-y)/N).
* wtl2 blend: df_dg = (1-wtl2)*dAdv + wtl2Matrix .* dL2 (train.lua:383,394),
              where wtl2Matrix is wtl2 everywhere except a 10x ring of width
              overlapPred around the predicted center (train.lua:389-400).
* video weighted MSE: weights = mask*(1-λ)+λ, df_dg_l2 .*= weights
              (train_vid_weighted.lua:493-498).
* masked MSE: nn.MaskedMSECriterion(mWeight) == mean(((1-w)M + w)(x-y)^2)
              (MaskedMSECriterion.lua:11-19) — same family as the video blend.
* GDL:        nn.GDLCriterion(alpha=1) (gdl_criterion.lua:10-36).  NOTE: the
              reference's crop pairing mixes axes (Yi2 is a column crop paired
              with the row crop Yi1, flattened elementwise because inputs are
              square) — we implement the *correct* axis-consistent
              gradient-difference loss and expose `gdl_torch_quirk` in the
              train step to reproduce the reference's buggy MSE backward
              (train_vid_weighted.lua:524-525) when bit-comparable training
              traces are wanted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jax.Array, target: jax.Array | float) -> jax.Array:
    """Mean binary cross-entropy; `target` may be a scalar label (0.0/1.0).
    Computed in f32 regardless of the activations' compute dtype."""
    logits = logits.astype(jnp.float32)
    t = jnp.asarray(target, dtype=logits.dtype)
    # max(x,0) - x*t + log1p(exp(-|x|)) == -[t log σ(x) + (1-t) log(1-σ(x))]
    loss = jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    """nn.MSECriterion: mean of squared error over all elements (f32)."""
    return jnp.mean(jnp.square(pred.astype(jnp.float32)
                               - target.astype(jnp.float32)))


def weighted_mse(pred: jax.Array, target: jax.Array,
                 weights: jax.Array) -> jax.Array:
    """sum(weights * (pred-target)^2) / numel, computed in f32.

    Gradient wrt pred: 2*weights*(pred-target)/numel — exactly the reference's
    element-weighted MSECriterion backward (train_vid_weighted.lua:497,
    train.lua:394).  `weights` broadcasts against pred.
    """
    err = jnp.square(pred.astype(jnp.float32)
                     - target.astype(jnp.float32)) * weights
    return jnp.sum(err) / pred.size


def mask_l2_weights(mask: jax.Array, weight_nomask: float) -> jax.Array:
    """weights = mask*(1-λ) + λ (train_vid_weighted.lua:494-495).

    mask is {0,1}; masked (logo) pixels get weight 1, context gets λ.
    """
    return mask * (1.0 - weight_nomask) + weight_nomask


def masked_mse(pred: jax.Array, target: jax.Array, mask: jax.Array,
               m_weight: float = 1.0) -> jax.Array:
    """nn.MaskedMSECriterion(mWeight): mean(((1-w)M + w) * (pred-target)^2)."""
    w = (1.0 - m_weight) * mask + m_weight
    return jnp.mean(w * jnp.square(pred - target))


def overlap_l2_weights(shape_hw: tuple[int, int], overlap_pred: int,
                       wtl2: float, overlap_weight: float = 10.0) -> jax.Array:
    """wtl2Matrix (train.lua:391-392): border ring of width overlapPred gets
    overlap_weight*wtl2, interior gets wtl2.  Returns an (H, W, 1) map."""
    h, w = shape_hw
    if overlap_pred <= 0:
        return jnp.full((h, w, 1), wtl2, dtype=jnp.float32)
    mat = jnp.full((h, w, 1), overlap_weight * wtl2, dtype=jnp.float32)
    return mat.at[overlap_pred:h - overlap_pred,
                  overlap_pred:w - overlap_pred].set(wtl2)


def gdl(pred: jax.Array, target: jax.Array, alpha: int = 1) -> jax.Array:
    """Axis-consistent gradient-difference loss (Mathieu et al. 2016).

    L = mean(| |∇_h Y| - |∇_h Ŷ| |^α) + mean(| |∇_w Y| - |∇_w Ŷ| |^α)

    The reference's nn.GDLCriterion intends this but pairs a column crop with a
    row crop (gdl_criterion.lua:12-23), relying on same-numel flat views of
    square images; we implement the correct form.  NHWC layout: axis 1 = H,
    axis 2 = W.
    """
    assert alpha == 1, "reference asserts alpha == 1 (gdl_criterion.lua:9)"

    pred32 = pred.astype(jnp.float32)
    target32 = target.astype(jnp.float32)

    def _term(axis):
        gy = jnp.abs(jnp.diff(target32, axis=axis))
        gp = jnp.abs(jnp.diff(pred32, axis=axis))
        return jnp.mean(jnp.abs(gy - gp))

    # H and W are the trailing spatial axes for both NHWC and NDHWC clips.
    return _term(-3) + _term(-2)


def psnr(pred: jax.Array, target: jax.Array, data_range: float = 2.0) -> jax.Array:
    """PSNR in dB; default range 2.0 for [-1,1] images."""
    err = jnp.mean(jnp.square(pred - target))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(err, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jax.Array:
    r = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * jnp.square(r / sigma))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(pred: jax.Array, target: jax.Array, data_range: float = 2.0,
         size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Mean SSIM (Wang et al. 2004): 11x11 Gaussian window, K1/K2 defaults,
    range 2.0 for [-1,1] images.  NHWC; channels treated independently
    (depthwise window conv).  The reference publishes no SSIM (its QC is
    visual, SURVEY §4) — this is part of the framework's quantitative story.
    """
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    c = x.shape[-1]
    win = jnp.broadcast_to(_gaussian_kernel(size, sigma)[..., None, None],
                           (size, size, 1, c))

    def blur(t):
        return jax.lax.conv_general_dilated(
            t, win, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    mu_x, mu_y = blur(x), blur(y)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x2 = blur(x * x) - mu_x2
    sig_y2 = blur(y * y) - mu_y2
    sig_xy = blur(x * y) - mu_xy
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    num = (2 * mu_xy + c1) * (2 * sig_xy + c2)
    den = (mu_x2 + mu_y2 + c1) * (sig_x2 + sig_y2 + c2)
    return jnp.mean(num / den)
