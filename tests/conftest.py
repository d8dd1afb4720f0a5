"""Test harness setup: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is validated on virtual CPU devices, per the
build-plan test strategy (SURVEY.md §4): JAX gives us a fake multi-device
backend for free via XLA_FLAGS.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
