"""Fixture generation + oracle decode helpers for the test suite.

Fixtures are deterministic WebM files produced by tools/make_fixture
(libaom-av1 + libvorbis via system ffmpeg libs); goldens come from
tools/oracle (libdav1d + native-vorbis float) and tools/vorbis_oracle
(true libvorbis float, compiled against the reference's minivorbis).
Everything is cached under tests/data/cache keyed by parameters.
"""

from __future__ import annotations

import hashlib
import json
import os
import struct
import subprocess
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

REPO = Path(__file__).resolve().parent.parent
TOOLS = REPO / "tools"
CACHE = REPO / "tests" / "data" / "cache"
REFERENCE = Path("/root/reference")


def _build_tools() -> None:
    targets = ["all"]
    if (REFERENCE / "ext/minivorbis/minivorbis.h").exists():
        targets.append("build/vorbis_oracle")
    subprocess.run(
        ["make", "-s", *targets], cwd=TOOLS, check=True,
        capture_output=True,
    )


_built = False


def tool(name: str) -> Path:
    global _built
    if not _built:
        _build_tools()
        _built = True
    return TOOLS / "build" / name


def have_vorbis_oracle() -> bool:
    return (REFERENCE / "ext/minivorbis/minivorbis.h").exists()


def make_fixture(**params) -> Path:
    """Generate (or reuse) a WebM fixture. params as make_fixture.c keys,
    plus vopt=list of libaom private options."""
    vopts = params.pop("vopt", [])
    key_src = json.dumps({**params, "vopt": sorted(vopts)}, sort_keys=True)
    key = hashlib.sha1(key_src.encode()).hexdigest()[:16]
    CACHE.mkdir(parents=True, exist_ok=True)
    out = CACHE / f"fx_{key}.webm"
    if out.exists():
        return out
    args = [str(tool("make_fixture")), str(out)]
    args += [f"{k}={v}" for k, v in params.items()]
    args += [f"vopt:{v}" for v in vopts]
    subprocess.run(args, check=True, capture_output=True)
    return out


class Golden:
    """Oracle decode result for a fixture."""

    def __init__(self, prefix: Path):
        self.meta = json.loads((prefix.with_suffix(".json")).read_text())
        self.prefix = prefix

    @property
    def frames(self) -> List[dict]:
        return self.meta["frames"]

    def video_frames(self) -> List[Dict[str, np.ndarray]]:
        """List of {'y','u','v'} plane arrays per frame."""
        w, h = self.meta["width"], self.meta["height"]
        depth = self.meta["depth"]
        ssx, ssy = self.meta["ss_x"], self.meta["ss_y"]
        dtype = np.uint16 if depth > 8 else np.uint8
        cw, ch = (w + (1 << ssx) - 1) >> ssx, (h + (1 << ssy) - 1) >> ssy
        per_frame = w * h + 2 * cw * ch
        raw = np.fromfile(self.prefix.with_suffix(".yuv"), dtype=dtype)
        out = []
        for i in range(self.meta["vframes"]):
            base = i * per_frame
            y = raw[base:base + w * h].reshape(h, w)
            u = raw[base + w * h:base + w * h + cw * ch].reshape(ch, cw)
            v = raw[base + w * h + cw * ch:base + per_frame].reshape(ch, cw)
            out.append({"y": y, "u": u, "v": v})
        return out

    def audio(self) -> np.ndarray:
        """(samples, channels) float32."""
        ch = self.meta["a_ch"] or 1
        raw = np.fromfile(self.prefix.with_suffix(".f32"), dtype=np.float32)
        return raw.reshape(-1, ch)


def oracle_decode(webm: Path) -> Golden:
    prefix = webm.parent / (webm.stem + "_golden")
    if not prefix.with_suffix(".json").exists():
        subprocess.run(
            [str(tool("oracle")), str(webm), str(prefix)],
            check=True, capture_output=True,
        )
    return Golden(prefix)


def vorbis_oracle_decode(packets: Sequence[bytes]) -> Optional[np.ndarray]:
    """True-libvorbis decode of raw Vorbis packets (3 headers first).
    Returns (samples, channels) float32 PCM, or None if oracle unavailable."""
    if not have_vorbis_oracle():
        return None
    key = hashlib.sha1(b"".join(packets)).hexdigest()[:16]
    CACHE.mkdir(parents=True, exist_ok=True)
    inp = CACHE / f"vo_{key}.pkts"
    outp = CACHE / f"vo_{key}.pcm"
    if not outp.exists():
        with open(inp, "wb") as f:
            f.write(struct.pack("<I", len(packets)))
            for p in packets:
                f.write(struct.pack("<I", len(p)))
                f.write(p)
        subprocess.run(
            [str(tool("vorbis_oracle")), str(inp), str(outp)],
            check=True, capture_output=True,
        )
    with open(outp, "rb") as f:
        ch, rate = struct.unpack("<II", f.read(8))
        (count,) = struct.unpack("<Q", f.read(8))
        pcm = np.frombuffer(f.read(), dtype=np.float32).reshape(-1, ch)
    assert pcm.shape[0] == count
    return pcm
