"""Checkpoint / resume.

The reference saves module graphs as .t7 every 20 epochs, scrubbing cudnn
modules and gradient buffers, and does NOT checkpoint optimizer state
(util.lua:72-105, train.lua:457-463) — finetunes restart Adam
(train_vid_weighted.lua:242-257).  Here a checkpoint is the full training
pytree — G/D params, BN running stats, BOTH Adam states, step counter — saved
as a flat .npz keyed by tree paths.  Restore rebuilds into a freshly-initialized
TrainState (structure is the schema; the file only carries leaves), so resume
is exact, not approximate.

File naming mirrors the reference convention
``checkpoints/<name>_<epoch>_net_G.t7`` -> ``<dir>/<name>_<epoch>_state.npz``.
"""

from __future__ import annotations

import json
import os
import re
import threading
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = jax.tree_util.keystr(path)
        arr = np.asarray(leaf)
        if arr.dtype.name == "bfloat16":
            # np.savez degrades ml_dtypes.bfloat16 to raw void ('V2') which
            # cannot be cast back on load; store as f32 (lossless superset) —
            # restore casts to the target leaf's dtype.
            arr = arr.astype(np.float32)
        flat[key] = arr
    return flat


def checkpoint_path(ckpt_dir: str, name: str, epoch: int | str) -> str:
    """Non-numeric ``epoch`` tags (e.g. ``"best"``) produce files the
    retention/resume scanners deliberately ignore (their ``_(\\d+)_``
    patterns)."""
    return os.path.join(ckpt_dir, f"{name}_{epoch}_state.npz")


def save_checkpoint(ckpt_dir: str, name: str, epoch: int, train_state: Any,
                    meta: dict | None = None,
                    async_write: bool = False) -> str:
    """Atomic save (tmp + rename) of the full training pytree.

    ``async_write=True``: the device→host fetch still happens here (it must —
    the loop donates the state buffers into the next step), but serialization
    + disk write move to a background thread so training resumes immediately.
    Call :func:`wait_pending_saves` before reading the file or exiting.
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    path = checkpoint_path(ckpt_dir, name, epoch)
    tmp = path + ".tmp"
    flat = _flatten(jax.device_get(train_state))

    def write() -> None:
        with open(tmp, "wb") as f:
            np.savez(f, __meta__=json.dumps(meta or {}), **flat)
        os.replace(tmp, path)

    if async_write:
        _raise_pending_error()  # surface an earlier failed write NOW, not
        # after N more epochs of "checkpoint: ..." lines over a dead path

        def guarded() -> None:
            try:
                write()
            except BaseException as e:  # noqa: BLE001 — report in the caller
                _SAVE_ERRORS.append((path, e))

        t = threading.Thread(target=guarded, daemon=False)
        t.start()
        _PENDING_SAVES.append(t)
    else:
        write()
    return path


_PENDING_SAVES: list[threading.Thread] = []
_SAVE_ERRORS: list[tuple[str, BaseException]] = []


def _raise_pending_error() -> None:
    errs = []
    while _SAVE_ERRORS:       # pop-one-at-a-time: no lost concurrent appends
        errs.append(_SAVE_ERRORS.pop(0))
    if errs:
        paths = ", ".join(f"{p!r} ({type(e).__name__}: {e})" for p, e in errs)
        raise RuntimeError(
            f"async checkpoint write failed — file(s) NOT saved (disk full "
            f"/ permissions?): {paths}") from errs[0][1]


def wait_pending_saves(timeout: float | None = None) -> None:
    """Block until all async checkpoint writes have hit disk.

    Raises if any background write failed (a silently-dropped checkpoint
    would leave autoResume with nothing despite the log claiming saves).
    A thread still alive after `timeout` stays tracked for the next call.
    """
    still_running = []
    while _PENDING_SAVES:
        t = _PENDING_SAVES.pop()
        t.join(timeout)
        if t.is_alive():
            still_running.append(t)
    _PENDING_SAVES.extend(still_running)
    _raise_pending_error()


def _restore_into(stored: dict[str, np.ndarray], target: Any,
                  prefix: str) -> Any:
    """Shared load/validate/unflatten core of the two restore entry points."""
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(target)
    leaves = []
    for path_t, leaf in paths_leaves:
        key = prefix + jax.tree_util.keystr(path_t)
        if key not in stored:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = stored[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"shape mismatch for {key}: checkpoint {arr.shape} vs "
                f"target {np.shape(leaf)}")
        leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def restore_checkpoint(path: str, target: Any) -> tuple[Any, dict]:
    """Restore into `target`'s structure; returns (state, meta).

    Every leaf in `target` must exist in the file with a matching shape —
    a shape/width mismatch (wrong config) fails loudly.
    """
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))
        stored = {k: data[k] for k in data.files if k != "__meta__"}
    return _restore_into(stored, target, ""), meta


def restore_subtree(path: str, target: Any, prefix: str) -> Any:
    """Restore only the leaves stored under `prefix` into `target`.

    E.g. ``restore_subtree(p, params_g_like, ".params_g")`` imports JUST the
    generator from any checkpoint whose G matches — the reference's
    util.load-a-single-net semantics (netI loads, train_mycrit.lua:261-265) —
    without requiring the discriminator/optimizer shapes to match (so a video
    checkpoint works as ``initName`` across regime variants)."""
    with np.load(path, allow_pickle=False) as data:
        stored = {k: data[k] for k in data.files if k != "__meta__"}
    return _restore_into(stored, target, prefix)


def prune_checkpoints(ckpt_dir: str, name: str, keep: int) -> list[str]:
    """Delete `name`'s checkpoints beyond the newest `keep` (by epoch).

    Full-width TrainStates are ~800 MB each; a 500-epoch run at the
    reference's checkpointEvery=20 keeps 25 of them.  Returns the deleted
    paths.  keep<=0 is a no-op (the reference keeps everything).  The loop
    prunes BEFORE each new save, so `keep` fully-written checkpoints always
    remain on disk even if the incoming (possibly async) write fails.
    """
    if keep <= 0 or not os.path.isdir(ckpt_dir):
        return []
    # An async save still writing its .tmp is invisible to the directory
    # listing — retention computed against that stale view would keep one
    # fewer finished checkpoint than promised once the rename lands.  Join
    # pending writes first so the count is exact (and surface their errors).
    wait_pending_saves()
    pat = re.compile(re.escape(name) + r"_(\d+)_state\.npz$")
    found = sorted(
        ((int(m.group(1)), fn) for fn in os.listdir(ckpt_dir)
         if (m := pat.match(fn))), reverse=True)
    deleted = []
    for _, fn in found[keep:]:
        p = os.path.join(ckpt_dir, fn)
        os.remove(p)
        deleted.append(p)
    return deleted


def restore_latest(ckpt_dir: str, name: str, target: Any):
    """Resume from the highest-epoch checkpoint, or None if none exist
    (the loadName/loadIter finetune path, train_vid_weighted.lua:242-257)."""
    if not os.path.isdir(ckpt_dir):
        return None
    pat = re.compile(re.escape(name) + r"_(\d+)_state\.npz$")
    best, best_epoch = None, -1
    for fn in os.listdir(ckpt_dir):
        m = pat.match(fn)
        if m and int(m.group(1)) > best_epoch:
            best, best_epoch = fn, int(m.group(1))
    if best is None:
        return None
    state, meta = restore_checkpoint(os.path.join(ckpt_dir, best), target)
    return state, meta, best_epoch
