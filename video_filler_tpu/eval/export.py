"""Export a trained generator to reference-format Torch7 .t7.

The write half of the checkpoint-exchange story (checkpoint/t7.py): a net
trained here can be handed back to the reference stack (util.load,
demo.lua/test*.lua) or archived in the reference's own format.

CLI:
    python -m video_filler_tpu.eval.export regime=video \
        net=checkpoints/exp1_20_state.npz out=exp1_netG.t7 [predLen=4 ...]
"""

from __future__ import annotations

import sys

import jax

from video_filler_tpu.checkpoint import restore_subtree
from video_filler_tpu.checkpoint.t7 import export_generator
from video_filler_tpu.config import from_args
from video_filler_tpu.models import build_generator, specs_for_regime


def main(argv: list[str]) -> None:
    regime, out, rest = "center", "netG.t7", []
    for a in argv:
        k, _, v = a.partition("=")
        if k == "regime":
            regime = v
        elif k == "out":
            out = v
        else:
            rest.append(a)
    opt = from_args(rest)
    if not opt.net:
        raise SystemExit("export needs net=<checkpoint .npz>")
    gspec, _ = specs_for_regime(opt, regime)
    gen = build_generator(gspec)
    params_t, state_t = gen.init(jax.random.PRNGKey(0))
    params = restore_subtree(opt.net, params_t, ".params_g")
    bn_state = restore_subtree(opt.net, state_t, ".state_g")
    export_generator(params, bn_state, gspec, out)
    print(f"wrote {out} (regime={regime}, from {opt.net})")


def cli() -> None:
    """Console-script entry point (`vf-export-t7`, pyproject.toml)."""
    main(sys.argv[1:])


if __name__ == "__main__":
    main(sys.argv[1:])
