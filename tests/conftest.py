"""Test config: run on CPU with 8 virtual devices so multi-chip sharding paths
are exercised without TPU hardware (the TPU analogue of testing multi-node
without a cluster — SURVEY.md §4)."""

import os

# Hard override: the environment presets JAX_PLATFORMS=axon (real TPU); tests
# must run on the virtual-device CPU mesh.  jax may already be imported by a
# pytest plugin (env vars would be read too late), so set the config directly.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: XLA-CPU conv compiles dominate suite time
# (cold conv3d backward compiles run tens of minutes); cache hits make reruns
# near-instant.  Repo-local so it survives across sessions; keyed by CPU
# identity so entries AOT-compiled on another machine can't SIGILL here.
from video_filler_tpu.utils import host_keyed_cache_dir  # noqa: E402

_cache_dir = host_keyed_cache_dir(os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
