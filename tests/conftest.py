"""Test config: force JAX onto a virtual 8-device CPU platform.

Real-TPU runs are only for bench.py (driver-invoked); the test suite is
hermetic on CPU so sharding logic is exercised via
--xla_force_host_platform_device_count (see task environment notes).
"""

import os

# EASYAV1_TEST_PLATFORM=<platform> runs the device-kernel tests against
# the real chip instead of the hermetic CPU mesh — used to record
# on-hardware validation of the jax compute paths (VERDICT r4 item 7).
# The value is the JAX platform name: "axon" through this host's TPU
# tunnel, "tpu" on a directly-attached TPU VM.
_PLATFORM = os.environ.get("EASYAV1_TEST_PLATFORM", "cpu")

os.environ["JAX_PLATFORMS"] = _PLATFORM
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# persistent XLA compile cache (same dir as bench.py): device-kernel
# tests dominated the 18-minute round-2 suite wall time purely through
# recompiles; a warm cache cuts repeat runs to the actual compute
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_repo, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import sys

sys.path.insert(0, _repo)

# The axon TPU plugin force-appends itself to jax_platforms at import time;
# pin the config back to cpu so tests run on the virtual 8-device host mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", _PLATFORM)

import pytest  # noqa: E402

# Device/Pallas-kernel tests are marked slow (first run pays XLA
# compiles).  The default selection skips them for a fast signal;
# `pytest -m ""` (or -m slow) runs everything — see pyproject addopts.
SLOW_FILES = {
    "test_cdef_jax.py", "test_fg_jax.py",
    "test_lf_jax.py", "test_lr_jax.py", "test_intra_pallas.py",
    "test_device_bridge.py", "test_device_trace.py",
    "test_graft_entry.py",
}
# compile-heaviest device files: a second tier so `-m slow` stays a
# <5 min slice on this host (measured: itx_jax ~11 min, mc_jax ~6 min,
# multistream ~2 min with a warm .jax_cache)
XSLOW_FILES = {
    "test_itx_jax.py", "test_mc_jax.py", "test_multistream.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = os.path.basename(str(item.fspath))
        if base in SLOW_FILES:
            item.add_marker(pytest.mark.slow)
        elif base in XSLOW_FILES:
            item.add_marker(pytest.mark.slow)
            item.add_marker(pytest.mark.xslow)
