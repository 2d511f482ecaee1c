"""ctypes bindings for the native C++ loader (native/vf_native.cpp).

The native library does parallel JPEG/PNG decode + short-side resize + shared
per-clip random crop with the GIL released — the donkey-pool + `image` C-lib
role (data/data.lua:26-60, data/donkey_folder.lua:39-62) as real native code.
Falls back transparently to the pure-Python path when the .so can't be built.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libvf_native.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _so_is_current() -> bool:
    """The .so must exist, be newer than its source, AND have been built on
    THIS CPU: build.sh uses -march=native, and the repo directory (incl. the
    gitignored .so) moves across machines — a foreign .so can SIGILL with no
    Python exception (same hazard class as the host-keyed jax cache)."""
    if not os.path.exists(_SO_PATH):
        return False
    src = os.path.join(_NATIVE_DIR, "vf_native.cpp")
    if os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(_SO_PATH):
        return False
    from video_filler_tpu.utils.cache import host_tag
    try:
        with open(_SO_PATH + ".host") as f:
            return f.read().strip() == host_tag()
    except OSError:
        return False  # no provenance record: rebuild rather than risk SIGILL


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not _so_is_current():
            try:
                # build.sh compiles to a temp name and atomically renames, so
                # concurrent builders can't expose a half-written .so; the
                # provenance file is likewise written via rename.
                subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                               check=True, capture_output=True, timeout=120)
                from video_filler_tpu.utils.cache import host_tag
                tag_tmp = f"{_SO_PATH}.host.{os.getpid()}.tmp"
                with open(tag_tmp, "w") as f:
                    f.write(host_tag())
                os.replace(tag_tmp, _SO_PATH + ".host")
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.vf_load_clips.restype = ctypes.c_int
        lib.vf_load_clips.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int]
        lib.vf_image_size.restype = ctypes.c_int
        lib.vf_image_size.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_int),
                                      ctypes.POINTER(ctypes.c_int)]
        lib.vf_load_frames.restype = ctypes.c_int
        lib.vf_load_frames.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def image_size(path: str) -> tuple[int, int]:
    lib = _load()
    assert lib is not None
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.vf_image_size(path.encode(), ctypes.byref(h), ctypes.byref(w)):
        raise IOError(f"native decode failed for {path}")
    return h.value, w.value


def load_clips(clip_paths: list[list[str]], load_size: int, crop: int,
               seeds: np.ndarray, n_threads: int = 0
               ) -> tuple[np.ndarray, np.ndarray, int]:
    """Decode clips in parallel with one shared random crop per clip.

    Returns (batch (n, crop, crop, frames*3) uint8,
             offsets (n, 4) int32 [y, x, resized_h, resized_w],
             n_failures).
    """
    lib = _load()
    assert lib is not None
    n = len(clip_paths)
    if n == 0:
        return (np.empty((0, crop, crop, 0), np.uint8),
                np.zeros((0, 4), np.int32), 0)
    frames = len(clip_paths[0])
    # The C side indexes paths[ci*frames + fi]: a ragged clip list would
    # read past the ctypes array (garbage pointers into fopen), and an
    # empty clip hits imgs[0] on an empty vector — both UB, reject here.
    if frames == 0 or any(len(c) != frames for c in clip_paths):
        raise ValueError(
            "load_clips needs equal-length, non-empty clips; got lengths "
            f"{sorted({len(c) for c in clip_paths})}")
    flat = [p.encode() for clip in clip_paths for p in clip]
    arr = (ctypes.c_char_p * len(flat))(*flat)
    out = np.empty((n, crop, crop, frames * 3), np.uint8)
    offsets = np.zeros((n, 4), np.int32)
    seeds = np.ascontiguousarray(seeds, np.uint64)
    fails = lib.vf_load_clips(
        arr, n, frames, load_size, crop,
        seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads)
    return out, offsets, fails


def load_frames(paths: list[str], load_size: int, max_h: int, max_w: int,
                n_threads: int = 0, out: np.ndarray | None = None
                ) -> tuple[np.ndarray, np.ndarray, int]:
    """Decode + short-side-resize full frames in parallel (no crop) — the
    wholeim/logo donkeys' heavy per-sample work.

    Returns (buf (n, max_h, max_w, 3) uint8 — frame i occupies
             buf[i, :h, :w]; hw (n, 2) int32 [h, w], (0, 0) = this frame
             failed (decode error / exceeds the slot); n_failures).
    ``out``: caller-owned slot buffer to reuse across batches (its first n
    slots are used; allocating tens of MB per batch measurably slowed the
    wholeim pump)."""
    lib = _load()
    assert lib is not None
    n = len(paths)
    flat = [p.encode() for p in paths]
    arr = (ctypes.c_char_p * n)(*flat)
    if out is not None and out.shape[0] >= n \
            and out.shape[1:] == (max_h, max_w, 3):
        buf = out[:n]
    else:
        buf = np.empty((n, max_h, max_w, 3), np.uint8)
    hw = np.zeros((n, 2), np.int32)
    fails = lib.vf_load_frames(
        arr, n, load_size, max_h, max_w,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads)
    return buf, hw, fails
