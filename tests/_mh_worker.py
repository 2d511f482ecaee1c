"""Multi-host worker process, spawned in pairs by test_distributed.py.

Each worker is one "host" of a 2-process jax.distributed CPU cluster
(4 virtual devices per process, 8 global).  It verifies slice integrity of
global_batch_from_local, then runs the real training loop end-to-end and
dumps its final generator params for cross-host / vs-single-process
comparison.

Usage: python _mh_worker.py <pid> <port> <data_root> <out_npz> [mode]

mode "train" (default): slice-integrity check + end-to-end loop.
mode "desync": autoResume with a checkpoint visible only to host 0 — the
loop's collective resume check must abort BOTH processes with a clear error
(simulates checkpointDir not being a shared filesystem).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid, port, data_root, out = (int(sys.argv[1]), sys.argv[2], sys.argv[3],
                                 sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "train"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from video_filler_tpu.utils import host_keyed_cache_dir
    cache = host_keyed_cache_dir(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and jax.device_count() == 8

    import numpy as np

    from video_filler_tpu import parallel
    from video_filler_tpu.config import Opt
    from video_filler_tpu.parallel import distributed
    from video_filler_tpu.train.loop import train

    if mode == "desync":
        # Each process sees a DIFFERENT checkpointDir (per-process cwd); only
        # host 0 has a checkpoint — the resume agreement check must abort.
        from video_filler_tpu.checkpoint import save_checkpoint
        from video_filler_tpu.train import init_train_state

        opt = Opt(DATA_ROOT=data_root, loadSize=128, wtl2=0.999, nef=8,
                  ngf=8, ndf=8, nBottleneck=32, batchSize=8, nThreads=0,
                  niter=2, ntrain=8, manualSeed=222, display=False,
                  autoResume=True, computeDtype="float32", name="ds")
        if pid == 0:
            save_checkpoint("checkpoints", "ds", 1,
                            init_train_state(jax.random.PRNGKey(0), opt,
                                             "center"))
        try:
            train(opt, "center", quiet=True)
        except SystemExit as e:
            assert "resume desync" in str(e), str(e)
            print(f"worker {pid} desync detected as expected")
            return
        raise AssertionError("desync was not detected")

    # --- slice integrity: this host's rows land only in this host's shards.
    mesh = parallel.make_mesh(n_data=8)
    local = np.full((4, 2, 2, 3), pid, np.uint8)
    g = distributed.global_batch_from_local(mesh, {"raw": local})["raw"]
    assert g.shape == (8, 2, 2, 3)
    for shard in g.addressable_shards:
        assert (np.asarray(shard.data) == pid).all(), \
            "host fed another host's slice"

    # --- end-to-end: the real loop over the 2-process mesh.
    opt = Opt(DATA_ROOT=data_root, loadSize=128, wtl2=0.999, nef=8, ngf=8,
              ndf=8, nBottleneck=32, batchSize=8, nThreads=0, niter=2,
              ntrain=8, manualSeed=222, display=False, checkpointEvery=1,
              computeDtype="float32", name="mh")
    state = train(opt, "center", quiet=True)
    flat = np.concatenate([np.asarray(x).ravel()
                           for x in jax.tree.leaves(state.params_g)])
    np.savez(out, step=int(state.step), params_g=flat)
    print(f"worker {pid} done: step={int(state.step)}")


if __name__ == "__main__":
    main()
