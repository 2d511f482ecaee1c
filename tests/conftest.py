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
assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
