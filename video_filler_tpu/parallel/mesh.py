"""Device mesh + sharding rules — the framework's distributed story.

The reference trains on ONE GPU (`cutorch.setDevice`, train.lua:248-258); its
only parallelism is threaded data loading (data/data.lua:26-60).  Here
parallelism is first-class and TPU-native:

* a 2-D ``Mesh`` with axes ``('data', 'model')``;
* **DP**: the batch is sharded over ``data`` — under jit, XLA turns the loss
  gradient into per-shard compute + an ``all-reduce`` over ICI (the
  BASELINE.json north star).  BatchNorm statistics are global automatically:
  the batch-axis mean inside the jitted step becomes a psum over the mesh.
* **TP** (optional, ``model`` axis > 1): the two giant bottleneck "matmuls"
  (encoder 4x4-valid conv to nBottleneck — e.g. 8*64*16 x 4000 — and the
  mirror decoder head) shard their nBottleneck dimension; XLA inserts the
  contraction collectives.  Everything else is replicated (the convs are
  small).
* multi-host: ``jax.distributed.initialize`` + the same mesh spanning all
  processes; data sharding uses per-host arrays
  (``jax.make_array_from_process_local_data``).

No NCCL/MPI translation — shardings in, collectives out.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data','model') mesh. Default: all devices on the data axis.

    With multiple ICI-connected hosts the flat device list is contiguous per
    host, so a 2-D reshape keeps model groups intra-host/slice (TP traffic on
    the fastest links) and DP across the rest.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_model < 1:
        raise ValueError(f"n_model must be >= 1, got {n_model}")
    if n_data is None or n_data <= 0:
        n_data = devices.size // n_model
        if n_data < 1:
            raise ValueError(
                f"model axis {n_model} does not fit: only {devices.size} "
                f"device(s) available")
    if n_data * n_model > devices.size:
        raise ValueError(
            f"mesh data:{n_data} x model:{n_model} needs "
            f"{n_data * n_model} devices but only {devices.size} available")
    grid = _device_grid(devices[: n_data * n_model], (n_data, n_model))
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _device_grid(devices: np.ndarray, shape: tuple[int, ...]) -> np.ndarray:
    """ICI-topology-aware device grid: on real TPU meshes
    jax.experimental.mesh_utils picks an assignment that keeps the minor
    (model/seq) axis on the fastest links; plain reshape otherwise."""
    try:
        from jax.experimental import mesh_utils
        return mesh_utils.create_device_mesh(shape, devices=list(devices))
    except Exception:
        return np.asarray(devices).reshape(shape)


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def _param_spec(path: tuple, leaf, tp: bool) -> tuple[P, str | None]:
    """TP rules keyed on the param-tree path; returns (spec, rule_name).

    Generator bottleneck (models/context_encoder.py):
      enc/conv5/w   (...,8nef,nB)  -> shard nB (LAST axis: out channels)
      bott_bn/{gamma,beta}  (nB,)  -> shard
      dec/up0/w     (...,nB,8ngf)  -> shard nB (second-to-last: in channels)
    Axis positions derive from leaf.ndim so the 5-D video3d conv weights
    ((t,kh,kw,cin,cout)) shard the same logical dimension as the 2-D family.
    Everything else replicated.
    """
    if not tp:
        return P(), None
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(k) for k in keys)
    nd = getattr(leaf, "ndim", 0)
    if joined.endswith("enc/conv5/w"):
        return P(*([None] * (nd - 1)), MODEL_AXIS), "enc/conv5/w"
    if "bott_bn" in joined and keys[-1] in ("gamma", "beta", "mean", "var"):
        return P(MODEL_AXIS), "bott_bn"
    if joined.endswith("dec/up0/w"):
        return P(*([None] * (nd - 2)), MODEL_AXIS, None), "dec/up0/w"
    return P(), None


_TP_RULES = ("enc/conv5/w", "bott_bn", "dec/up0/w")


def state_shardings(mesh: Mesh, train_state: Any) -> Any:
    """A TrainState-shaped pytree of NamedShardings.

    Params/opt-state follow the TP rules (opt-state mirrors the param tree, so
    the same path matching applies); BN running stats follow their params;
    step is replicated.
    """
    tp = mesh.shape[MODEL_AXIS] > 1
    matched: set[str] = set()

    def spec_of(path, leaf):
        spec, rule = _param_spec(path, leaf, tp)
        if rule is not None:
            matched.add(rule)
        return NamedSharding(mesh, spec)

    out = jax.tree_util.tree_map_with_path(spec_of, train_state)
    missing = [r for r in _TP_RULES if r not in matched]
    if tp and missing:
        # The TP rules key on param-tree path names; a rename must fail loudly
        # rather than silently training (partly) replicated on a model>1 mesh.
        raise ValueError(
            "TP requested (model axis > 1) but these bottleneck sharding "
            f"rules matched no parameter: {missing} — have layer names "
            "changed? (see _param_spec)")
    return out


def shard_train_state(mesh: Mesh, train_state: Any) -> Any:
    """device_put the state with its shardings (replicated or TP-sharded).

    Multi-process: built per-leaf via make_array_from_callback — every host
    holds the full value (init/restore are deterministic and identical
    across hosts), so each process just fills its OWN addressable shards;
    no collectives, no cross-host value checks.  device_put here would
    instead reshard-from-committed / assert-equal through cross-process
    programs, which deadlocks the CPU gloo backend (measured: context
    init timeout) for TP (model-axis) shardings.
    """
    return put_with_shardings(train_state, state_shardings(mesh, train_state))


def put_with_shardings(tree: Any, shardings: Any) -> Any:
    """device_put a host pytree with per-leaf shardings, multi-process-safe
    (see shard_train_state's docstring for why device_put alone is not)."""
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)
    host_tree = jax.device_get(tree)

    def build(x, sh):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    return jax.tree.map(build, host_tree, shardings)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """device_put a host batch sharded over the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
