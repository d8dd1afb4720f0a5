"""Test harness setup: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is validated on virtual CPU devices, per the
build-plan test strategy (SURVEY.md §4). The axon sitecustomize imports
jax at interpreter start with JAX_PLATFORMS=axon, so the env var alone is
too late — we must update jax.config directly (the CPU client is created
lazily, so XLA_FLAGS set here still takes effect).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: multi-process / long tests")
