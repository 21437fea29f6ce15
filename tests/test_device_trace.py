"""tools/device_trace.py smoke: the XPlane capture path works (SURVEY
§5.1 device-side profiling; host side is covered by profile_stages)."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_device_trace_writes_xplane(tmp_path):
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "device_trace.py"),
         str(tmp_path / "tr"), "vorbis"],
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-500:]
    assert list((tmp_path / "tr").rglob("*.xplane.pb"))
