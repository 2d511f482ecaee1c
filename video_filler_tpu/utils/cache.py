"""Persistent-compile-cache helpers.

The repo directory (including gitignored caches) is carried across machines;
XLA AOT artifacts compiled for another CPU's feature set spam loader warnings
and can SIGILL when executed.  Keying the cache directory by the host's CPU
identity keeps each machine's entries separate.
"""

from __future__ import annotations

import hashlib
import os


def host_tag() -> str:
    """CPU fingerprint: model name + flags from /proc/cpuinfo (stable across
    boots, distinct across machine types)."""
    try:
        with open("/proc/cpuinfo") as f:
            ident = [ln for ln in f if ln.startswith(("model name", "flags"))]
        return hashlib.sha1(
            "".join(sorted(set(ident))).encode()).hexdigest()[:12]
    except OSError:
        return "default"


def host_keyed_cache_dir(base: str) -> str:
    """``base/<cpu-fingerprint>``, created."""
    path = os.path.join(base, host_tag())
    os.makedirs(path, exist_ok=True)
    return path
