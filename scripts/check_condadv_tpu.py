"""TPU validation of the conditionAdv discriminator head (train.lua:158-180).

Round 1 hit a TPU-compiler space-to-batch SIGABRT on the 5x5/stride-2
pred-branch backward; with the hoisted explicit zero-pad formulation
(models/context_encoder.py) and the current compiler the full train step
compiles and runs.  This script is the runnable evidence:

1. run one FULL-WIDTH conditionAdv center-regime train step on the default
   backend (real TPU under the preset JAX_PLATFORMS=axon), print metrics,
   and save loss + Adam-update fingerprints;
2. re-run itself on CPU (subprocess) and compare: losses to ~2e-3 relative,
   per-param updates within the Adam sign-flip envelope (first-step updates
   are ~lr*sign(g), so backend f32 noise at g~0 is worth 2*lr — real
   divergence shows up as O(1) disagreement).

Usage:  timeout 900 python scripts/check_condadv_tpu.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FPR = "/tmp/condadv_fingerprint.npz"


def run_step():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_filler_tpu.utils import host_keyed_cache_dir
    jax.config.update("jax_compilation_cache_dir", host_keyed_cache_dir(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")))
    import video_filler_tpu.train.step as S
    from video_filler_tpu.config import Opt

    opt = Opt(batchSize=16, fineSize=128, nBottleneck=4000, wtl2=0.999,
              overlapPred=4, conditionAdv=True, computeDtype="float32")
    state = S.init_train_state(jax.random.PRNGKey(0), opt, "center")
    step = jax.jit(S.make_train_step(opt, "center"))
    rs = np.random.RandomState(0)
    batch = {"real": jnp.asarray(
        rs.rand(16, 128, 128, 3).astype(np.float32) * 2 - 1)}
    ns, metrics = step(state, batch, jax.random.PRNGKey(1))
    m = {k: float(v) for k, v in metrics.items()}
    d_up0 = (np.asarray(ns.params_g["dec"]["up0"]["w"])
             - np.asarray(state.params_g["dec"]["up0"]["w"]))
    d_pred = (np.asarray(ns.params_d["pred"]["w"])
              - np.asarray(state.params_d["pred"]["w"]))
    return m, d_up0, d_pred, opt


def main() -> None:
    if os.environ.get("_CONDADV_CPU_CHILD") == "1":
        import jax
        jax.config.update("jax_platforms", "cpu")
        import numpy as np
        m, d_up0, d_pred, _ = run_step()
        np.savez(FPR + ".cpu.npz", **m, d_up0=d_up0, d_pred=d_pred)
        return

    import numpy as np
    m, d_up0, d_pred, opt = run_step()
    print("TPU conditionAdv full-width step:", json.dumps(m))

    env = dict(os.environ, _CONDADV_CPU_CHILD="1", JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                   check=True, timeout=900)
    cpu = np.load(FPR + ".cpu.npz")
    ok = True
    for k in ("errD", "errD_real", "errG", "errG_l2"):
        rel = abs(m[k] - float(cpu[k])) / max(abs(float(cpu[k])), 1e-9)
        print(f"{k}: tpu {m[k]:.6f} cpu {float(cpu[k]):.6f} rel {rel:.2e}")
        ok &= rel < 5e-3
    for name, a, b in (("dec/up0", d_up0, cpu["d_up0"]),
                       ("D pred head", d_pred, cpu["d_pred"])):
        lr_eff = opt.lr * (10 if name == "dec/up0" else 1)
        within = np.abs(a - b) <= 2.05 * lr_eff
        print(f"Adam delta {name}: {100 * within.mean():.2f}% within the "
              f"sign-flip envelope (max {np.abs(a - b).max():.2e})")
        ok &= within.mean() > 0.9
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
