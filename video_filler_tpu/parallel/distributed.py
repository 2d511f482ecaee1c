"""Multi-host (multi-process) training support.

The reference has no distributed story at all (single `cutorch.setDevice`,
train.lua:248-258).  Here multi-host is the standard JAX recipe:

* each host process calls ``initialize()`` (jax.distributed handshake over
  DCN; coordinator address from args or cluster env),
* the SAME SPMD program runs everywhere — the mesh spans all processes'
  devices, gradients all-reduce over ICI within a slice and DCN across
  slices, inserted by XLA from the shardings (no NCCL/MPI code),
* each host feeds only its shard of the global batch:
  ``global_batch_from_local`` wraps process-local numpy data into a global
  jax.Array with the data-axis sharding.

Single-process usage is unchanged — these helpers no-op gracefully.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

from video_filler_tpu.parallel.mesh import DATA_AXIS, batch_sharding


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with explicit args or cluster auto-detect.

    Call before any jax device use on every host.  No-op when running a
    single process with no coordinator configured.
    """
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError) as e:
            # Two errors degrade to single-process: "no cluster env
            # detected" (auto-detect leaves coordinator_address unset ->
            # ValueError naming it) and the late-call RuntimeError when a
            # single-process session already touched jax.  A real cluster
            # whose handshake fails (coordinator briefly unreachable, DNS
            # hiccup) must die loudly instead — N hosts silently training
            # independently against one checkpoint name is corruption,
            # not a fallback.  Matched by type AND message (strings from
            # jax 0.9.0 _src/distributed.py: "coordinator_address should
            # be defined." / "jax.distributed.initialize() must be called
            # before ..."); if an upgrade rewords them, a ValueError with
            # no cluster marker in the environment still means "no cluster
            # auto-detected" — only that combination stays local.
            msg = str(e)
            cluster_env = any(
                os.environ.get(v)
                for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                          "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE",
                          "PMI_RANK", "PMIX_RANK",
                          "MEGASCALE_COORDINATOR_ADDRESS",
                          "TPU_WORKER_HOSTNAMES"))
            if ("coordinator_address" in msg
                    or "must be called before" in msg
                    or (isinstance(e, ValueError) and not cluster_env)):
                return  # single-process / no cluster env: stay local
            raise
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    _guard_cpu_collective_cache()


def _guard_cpu_collective_cache() -> None:
    """Disable the persistent compilation cache on multi-process CPU
    backends: a DESERIALIZED XLA:CPU executable whose program contains
    cross-process (gloo) collectives deadlocks at execution — cold compiles
    pass, every warm AOT-load hangs (measured on the TP fused step; the
    failure is silent and looks like a stuck collective).  TPU backends keep
    the cache — their AOT path is unaffected."""
    if jax.process_count() > 1 and jax.default_backend() == "cpu":
        cache_dir = getattr(jax.config, "jax_compilation_cache_dir", None)
        if cache_dir:
            print(f"WARNING: disabling persistent compilation cache "
                  f"({cache_dir}) — deserialized XLA:CPU executables with "
                  "cross-process collectives deadlock at execution",
                  flush=True)
            jax.config.update("jax_compilation_cache_dir", None)


def process_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start, size) of this host's slice of the global batch."""
    n, i = jax.process_count(), jax.process_index()
    assert global_batch % n == 0, (
        f"global batch {global_batch} must divide process count {n}")
    per = global_batch // n
    return i * per, per


def global_batch_from_local(mesh, local_batch: dict[str, np.ndarray]
                            ) -> dict[str, Any]:
    """Assemble a global, data-axis-sharded batch from per-host numpy arrays.

    Every host holds only its rows; jax stitches them into one logical array
    spanning the mesh (jax.make_array_from_process_local_data).
    """
    sharding = batch_sharding(mesh)

    def one(x: np.ndarray):
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x,
                                                      global_shape)

    return {k: one(v) for k, v in local_batch.items()}


def data_axis_size(mesh) -> int:
    return mesh.shape[DATA_AXIS]


def gather_pytree(tree: Any) -> Any:
    """Full (unsharded) host-numpy values of a possibly cross-process-sharded
    pytree — the collective gather behind multi-host TP checkpointing.

    Leaves that are fully replicated (DP params) or process-local are a plain
    device_get; leaves sharded ACROSS processes (the TP bottleneck weights /
    their Adam moments) are all-gathered to every host.  MUST be called by
    every process in lockstep (it runs collectives); with nothing
    cross-sharded it is equivalent to ``jax.device_get``.
    """
    from jax.experimental import multihost_utils

    def one(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable \
                and not x.is_fully_replicated:
            return multihost_utils.process_allgather(x, tiled=True)
        return jax.device_get(x)

    return jax.tree.map(one, tree)
