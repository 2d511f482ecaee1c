"""Export a trained generator as a serialized StableHLO artifact.

The deployment companion to serve.py: `jax.export` lowers the jitted
eval-mode forward — with the trained weights baked in as constants — to a
self-contained StableHLO blob that any JAX runtime (or other StableHLO
consumer) can deserialize and run WITHOUT this package's model code or the
checkpoint.  Cross-platform lowering means a CPU host can produce a TPU
artifact.

The reference has no deployment story beyond shipping .t7 checkpoints that
need the whole Torch7 stack to run (util.load, demo.lua); this is the
TPU-native equivalent of a frozen inference graph.

CLI:
    python -m video_filler_tpu.eval.export_hlo regime=video \
        net=checkpoints/exp1_20_state.npz out=netG.hlo \
        batchSize=64 [platforms=tpu,cpu] [predLen=4 ...]

Reload (no video_filler_tpu needed beyond jax):
    from jax import export
    g = export.deserialize(open("netG.hlo", "rb").read())
    out_u8 = g.call(ctx_u8)        # uint8 (B,H,W,C) -> uint8

All served generator shapes export: video3d takes/returns channel-folded
uint8 clips (B,S,S,nc*predLen) like serve.py's wire format; noiseGen
artifacts take a second (B,1,1,nz) f32 input: g.call(ctx_u8, noise).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
from jax import export as jax_export

from video_filler_tpu.config import Opt, from_args
from video_filler_tpu.eval.common import load_generator
from video_filler_tpu.models import specs_for_regime
from video_filler_tpu.ops import image as image_ops


def export_generator_hlo(opt: Opt, regime: str, net_path: str,
                         platforms: tuple[str, ...] = ("tpu", "cpu"),
                         ) -> bytes:
    """Serialize the eval-mode generator (weights baked in) to StableHLO.

    The exported function is the uint8-boundary forward used by serving:
    uint8 context in, uint8 frames out (normalize/denormalize fused), fixed
    batch = opt.batchSize.
    """
    _, params, bn_state = load_generator(opt, regime, net_path)
    from video_filler_tpu.models import build_for_regime
    gen = build_for_regime(opt, regime)[0]

    if regime == "video3d":
        # Same wire format as serve.py: channel-folded uint8 clips
        # (B, S, S, nc*predLen) in/out around the temporal G.
        from video_filler_tpu.ops.layers3d import fold_time, unfold_time

        from video_filler_tpu.models import video3d_fine_size
        fs = video3d_fine_size(opt)
        ctx_shape = (opt.batchSize, fs, fs, opt.nc * opt.predLen)

        def forward(ctx_u8):
            x = image_ops.normalize_uint8(ctx_u8)
            y, _ = gen.apply(params, bn_state,
                             unfold_time(x, opt.predLen), train=False)
            return image_ops.denormalize_to_uint8(
                fold_time(y).astype(jnp.float32))

        args = (jax.ShapeDtypeStruct(ctx_shape, jnp.uint8),)
    else:
        gspec, _ = specs_for_regime(opt, regime)
        ctx_shape = (opt.batchSize, opt.fineSize, opt.fineSize,
                     gspec.nc_in)
        if opt.noiseGen:
            # noiseGen joins (ctx, z) at the bottleneck (train.lua:143-152):
            # the artifact takes a second (B,1,1,nz) f32 input, matching
            # serve.py's noise parameter.
            def forward(ctx_u8, noise):
                x = image_ops.normalize_uint8(ctx_u8)
                y, _ = gen.apply(params, bn_state, (x, noise), train=False)
                return image_ops.denormalize_to_uint8(
                    y.astype(jnp.float32))

            args = (jax.ShapeDtypeStruct(ctx_shape, jnp.uint8),
                    jax.ShapeDtypeStruct((opt.batchSize, 1, 1, opt.nz),
                                         jnp.float32))
        else:
            def forward(ctx_u8):
                x = image_ops.normalize_uint8(ctx_u8)
                y, _ = gen.apply(params, bn_state, x, train=False)
                return image_ops.denormalize_to_uint8(
                    y.astype(jnp.float32))

            args = (jax.ShapeDtypeStruct(ctx_shape, jnp.uint8),)
    exp = jax_export.export(jax.jit(forward), platforms=list(platforms))(
        *args)
    return exp.serialize()


def main(argv: list[str]) -> None:
    regime, out, platforms, rest = "video", "netG.hlo", ("tpu", "cpu"), []
    for a in argv:
        k, _, v = a.partition("=")
        if k == "regime":
            regime = v
        elif k == "out":
            out = v
        elif k == "platforms":
            platforms = tuple(v.split(","))
        else:
            rest.append(a)
    opt = from_args(rest)
    if not opt.net:
        raise SystemExit("export_hlo needs net=<checkpoint .npz or .t7>")
    blob = export_generator_hlo(opt, regime, opt.net, platforms)
    with open(out, "wb") as f:
        f.write(blob)
    print(f"wrote {out} ({len(blob) / 1e6:.1f} MB StableHLO, "
          f"platforms={','.join(platforms)}, batch={opt.batchSize}, "
          f"from {opt.net})")


def cli() -> None:
    main(sys.argv[1:])


if __name__ == "__main__":
    main(sys.argv[1:])
