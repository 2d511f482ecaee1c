"""Measure remat's activation-memory / FLOPs trade on the fused step.

Compile-only: XLA's memory_analysis on the lowered step reports the temp
(activation) allocation directly — no execution needed, so it is honest
over the axon tunnel too (first execution of a big program uploads for
minutes; compiles are ~20-120 s).

Usage: python scripts/measure_remat.py [batch=512] [regime=center]
       [cpu=0] [width keys...]
Prints one row per config: temp bytes, argument bytes, FLOPs estimate.
"""
import os
import sys

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))

kv = dict(a.split("=", 1) for a in sys.argv[1:])
if kv.pop("cpu", "0") == "1":
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp
import numpy as np

from video_filler_tpu.config import Opt, from_args
from video_filler_tpu.train import (
    init_train_state,
    make_preprocess,
    make_train_step,
)

regime = kv.pop("regime", "center")
batch = int(kv.pop("batch", "512"))


def build(**over):
    args = [f"{k}={v}" for k, v in {**kv, **over}.items()]
    opt = from_args(args, Opt(batchSize=batch, computeDtype="bfloat16"))
    state = init_train_state(jax.random.PRNGKey(0), opt, regime)
    prep = make_preprocess(opt, regime)
    step = make_train_step(opt, regime)

    def fused(state, raw, seed):
        kp, ks = jax.random.split(jax.random.PRNGKey(seed))
        return step(state, prep({"raw": raw}, kp), ks)

    raw = jnp.zeros((batch, opt.fineSize, opt.fineSize, opt.nc), jnp.uint8)
    return jax.jit(fused, donate_argnums=0).lower(
        state, raw, np.int32(0)).compile()


for label, over in (("plain", {}),
                    ("remat", {"remat": 1}),
                    ("gradAccum=8", {"gradAccum": 8}),
                    ("remat+gradAccum=8", {"remat": 1, "gradAccum": 8})):
    c = build(**over)
    m = c.memory_analysis()
    fl = c.cost_analysis()
    flops = (fl or {}).get("flops", float("nan"))
    print(f"{label:>20}: temp {m.temp_size_in_bytes / 2**20:9.1f} MiB  "
          f"args {m.argument_size_in_bytes / 2**20:9.1f} MiB  "
          f"flops {flops / 1e9:8.1f} G", flush=True)
