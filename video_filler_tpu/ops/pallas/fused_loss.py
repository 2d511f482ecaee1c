"""Pallas TPU kernel: fused mask-weighted MSE with a custom VJP.

The reconstruction term of the G step is ``sum(w * (pred - target)^2) / N``
with elementwise weights folding wtl2, the overlap ring and the mask-λ blend
(ops/losses.py:weighted_mse; reference gradients train.lua:394 /
train_vid_weighted.lua:497).  XLA already fuses the forward elementwise chain
into one pass; what it cannot do is share that pass with the backward — the
VJP re-reads pred/target/weights from HBM.  This kernel computes the loss AND
stashes nothing: the backward is its own single-pass kernel
``(2/N) * w * (pred - target) * ḡ``, so each array is read from HBM exactly
once per direction and the (B,H,W,C) residual chain never materializes.

Forward:  grid over row-blocks; per-program partial sums reduced on host side
          of the kernel boundary (a (G,1) f32 output; the final jnp.sum is
          G elements — noise).
Backward: elementwise VPU kernel over the same blocking; the upstream scalar
          cotangent rides in SMEM.

Falls back to the jnp path when shapes don't tile to the f32 (8,128) minimum
(ops/losses.py remains the reference implementation; parity is tested in
interpret mode on CPU).

MEASURED (v5e, (64,128,128,12) f32, value_and_grad, 50-iter mean):
pallas 1146 us vs XLA-fused 914 us — XLA's automatic elementwise fusion
already saturates HBM bandwidth for this op, so the kernel is OFF by default
(Opt.usePallasLoss); it exists as the profiling-gated option SURVEY §7
anticipated and as the template for future fused ops.  Gradient parity on
TPU: max |Δ| ≈ 1e-13.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 256


def _flatten2d(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B*H, W*C): rows x lanes with the channel-minor layout
    preserved, so W*C stays a multiple of 128 for typical (128, nc*predLen)."""
    b, h, w, c = x.shape
    return x.reshape(b * h, w * c)


def pallas_supported(shape: tuple[int, ...]) -> bool:
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    rows, cols = b * h, w * c
    return cols % 128 == 0 and rows % 8 == 0


def _fwd_kernel(p_ref, t_ref, w_ref, out_ref):
    # Grid steps run sequentially on a TPU core; the (1,1) SMEM output block
    # maps to the same element every step, so accumulate across the grid.
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = 0.0

    d = p_ref[:] - t_ref[:]
    out_ref[0, 0] += jnp.sum(w_ref[:] * d * d)


def _bwd_kernel(p_ref, t_ref, w_ref, g_ref, out_ref):
    # g_ref: (1,1) SMEM — upstream cotangent already scaled by 2/N.
    out_ref[:] = (p_ref[:] - t_ref[:]) * w_ref[:] * g_ref[0, 0]


def _row_block(rows: int) -> int:
    blk = min(_BLOCK_ROWS, rows)
    while rows % blk:
        blk //= 2
    return max(blk, 1)


def _fwd_call(p2, t2, w2, interpret: bool):
    rows, cols = p2.shape
    blk = _row_block(rows)
    grid = rows // blk
    spec = pl.BlockSpec((blk, cols), lambda i: (i, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)
    total = pl.pallas_call(
        _fwd_kernel,
        grid=(grid,),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(p2, t2, w2)
    return total[0, 0]


def _bwd_call(p2, t2, w2, gscaled, interpret: bool):
    rows, cols = p2.shape
    blk = _row_block(rows)
    spec = pl.BlockSpec((blk, cols), lambda i: (i, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(rows // blk,),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        interpret=interpret,
    )(p2, t2, w2, gscaled)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_weighted_mse(pred: jax.Array, target: jax.Array,
                       weights: jax.Array, interpret: bool = False
                       ) -> jax.Array:
    """sum(weights * (pred-target)^2) / pred.size — Pallas-fused fwd+bwd.

    Semantics identical to ops/losses.weighted_mse (gradient wrt pred only;
    target/weights are data).  `weights` must broadcast to pred's shape.
    """
    w = jnp.broadcast_to(weights, pred.shape).astype(jnp.float32)
    val = _fwd_call(_flatten2d(pred.astype(jnp.float32)),
                    _flatten2d(target.astype(jnp.float32)),
                    _flatten2d(w), interpret)
    return val / pred.size


def _vjp_fwd(pred, target, weights, interpret):
    return (fused_weighted_mse(pred, target, weights, interpret),
            (pred, target, weights))


def _vjp_bwd(interpret, res, gbar):
    pred, target, weights = res
    w = jnp.broadcast_to(weights, pred.shape).astype(jnp.float32)
    gscaled = jnp.reshape(gbar * (2.0 / pred.size), (1, 1)).astype(jnp.float32)
    grad2 = _bwd_call(_flatten2d(pred.astype(jnp.float32)),
                      _flatten2d(target.astype(jnp.float32)),
                      _flatten2d(w), gscaled, interpret)
    grad = grad2.reshape(pred.shape).astype(pred.dtype)
    return grad, None, None


fused_weighted_mse.defvjp(_vjp_fwd, _vjp_bwd)
