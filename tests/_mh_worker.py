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
mode "tp": modelParallel=2 spanning the two processes — the TP bottleneck
leaves are sharded ACROSS hosts; verifies the collective-gather checkpoint
(save under TP, roundtrip exactness vs the live sharded state) and
autoResume continuing the run under the same TP mesh.
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
    # A persistent compilation cache would DEADLOCK these workers: a
    # deserialized XLA:CPU executable whose program contains CROSS-PROCESS
    # gloo collectives hangs at execution (measured: the identical TP fused
    # step runs with a cold cache — both processes compile — and hangs on
    # every warm run where both AOT-load; the DP tests only ever passed
    # because their caches were cold).  Set one anyway: the framework's
    # initialize() must detect and disable it (the guardrail under test).
    jax.config.update("jax_compilation_cache_dir", "/tmp/vf_mh_cache_trap")
    from video_filler_tpu.parallel import distributed as _dist
    _dist.initialize(coordinator_address=f"localhost:{port}",
                     num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and jax.device_count() == 8
    assert not jax.config.jax_compilation_cache_dir, \
        "initialize() failed to disable the persistent cache on gloo"

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

    if mode == "tp":
        # modelParallel=2 over 8 global devices = data:4 x model:2; the
        # model axis spans the two processes, so the TP-sharded bottleneck
        # leaves are NOT addressable from either host alone — checkpointing
        # them requires the loop's collective gather.
        from video_filler_tpu.checkpoint import (restore_checkpoint,
                                                 wait_pending_saves)
        from video_filler_tpu.train import init_train_state

        opt = Opt(DATA_ROOT=data_root, loadSize=128, wtl2=0.999, nef=8,
                  ngf=8, ndf=8, nBottleneck=32, batchSize=8, nThreads=0,
                  niter=1, ntrain=8, manualSeed=222, display=False,
                  checkpointEvery=1, modelParallel=2,
                  computeDtype="float32", name="tp")
        state1 = train(opt, "center", quiet=True)
        # The bottleneck weight really is cross-process-sharded (else this
        # mode tests nothing).
        w = state1.params_g["enc"]["conv5"]["w"]
        assert not w.is_fully_addressable and not w.is_fully_replicated, \
            "TP bottleneck leaf unexpectedly addressable"
        gathered = distributed.gather_pytree(state1)
        if pid == 0:
            # Roundtrip exactness: the checkpoint host 0 wrote holds the
            # full unsharded values of the live TP state.
            wait_pending_saves()
            restored, _ = restore_checkpoint(
                "checkpoints/tp_1_state.npz",
                jax.device_get(init_train_state(jax.random.PRNGKey(0), opt,
                                                "center")))
            for a, b in zip(jax.tree.leaves(gathered),
                            jax.tree.leaves(restored)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # Resume under the same TP mesh: save -> (simulated crash) -> new
        # loop restores the full state and re-shards it over the mesh.
        state2 = train(opt.replace(autoResume=True, niter=2), "center",
                       quiet=True)
        assert int(state2.step) == 2, int(state2.step)
        flat = np.concatenate(
            [np.asarray(x).ravel()
             for x in jax.tree.leaves(distributed.gather_pytree(
                 state2.params_g))])
        np.savez(out, step=int(state2.step), params_g=flat)
        print(f"worker {pid} tp done: step={int(state2.step)}")
        return

    if mode == "dd":
        # dataDevice over 2 processes: the corpus becomes a GLOBAL
        # replicated array (each host feeds its local replicas after the
        # cross-host checksum agreement), batches are synthesized in-jit —
        # the batch stream is a pure function of (seed, step), so this run
        # must match a single-process dataDevice run on the same corpus.
        opt = Opt(DATA_ROOT=data_root, loadSize=128, wtl2=0.999, nef=8,
                  ngf=8, ndf=8, nBottleneck=32, batchSize=8, nThreads=0,
                  niter=2, ntrain=8, manualSeed=222, display=False,
                  checkpointEvery=1, dataDevice=True,
                  computeDtype="float32", name="dd")
        state = train(opt, "center", quiet=True)
        flat = np.concatenate([np.asarray(x).ravel()
                               for x in jax.tree.leaves(state.params_g)])
        np.savez(out, step=int(state.step), params_g=flat)
        print(f"worker {pid} dd done: step={int(state.step)}")
        return

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
