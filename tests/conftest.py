"""Test config: force JAX onto a virtual 8-device CPU platform.

Real-TPU runs are only for bench.py (driver-invoked); the test suite is
hermetic on CPU so sharding logic is exercised via
--xla_force_host_platform_device_count (see task environment notes).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin force-appends itself to jax_platforms at import time;
# pin the config back to cpu so tests run on the virtual 8-device host mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
