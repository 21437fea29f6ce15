"""Multi-stream batched decode (BASELINE config 5 shape) on the
virtual device mesh: N real AV1 streams, production entropy decode +
recon per stream, one mesh-sharded vmapped LF+CDEF postfilter step —
each stream bit-exact vs its ordinary single-stream decode."""

import jax
import pytest

from easyav1_tpu.parallel.mesh import make_mesh
from easyav1_tpu.parallel.multistream_av1 import run_multistream


def test_multistream_real_decode_dp():
    n = len(jax.devices())
    if n < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = make_mesh(n, tp=1)
    assert run_multistream(mesh, n_streams=n) == n


def test_multistream_more_streams_than_devices():
    n = len(jax.devices())
    if n < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = make_mesh(n, tp=1)
    assert run_multistream(mesh, n_streams=2 * n) == 2 * n
