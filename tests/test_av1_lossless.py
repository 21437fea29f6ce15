"""Lossless (coded_lossless, inverse WHT) conformance: real libaom
lossless=1 streams, intra and inter, decoded bit-exact vs libdav1d.

Reference parity: easyav1 decodes via dav1d (src/easyav1.c); covers
dav1d itx.c WHT_WHT + the lossless header/parse gates."""

import hashlib
import subprocess

import numpy as np

from fixtures import CACHE, tool


def _roundtrip(w, h, frames, gop):
    args_tail = [f"w={w}", f"h={h}", "fps=10", f"frames={frames}",
                 f"gop={gop}", "crf=40", "audio_secs=0",
                 "vopt:lossless=1", "vopt:enable-restoration=0",
                 "vopt:enable-palette=0", "vopt:enable-filter-intra=0",
                 "vopt:enable-intrabc=0", "vopt:lag-in-frames=0"]
    phash = hashlib.sha1(" ".join(args_tail).encode()).hexdigest()[:8]
    out = CACHE / f"ll_{phash}.webm"
    if not out.exists():
        r = subprocess.run([str(tool("make_fixture")), str(out)]
                           + args_tail, capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
    prefix = CACHE / out.stem
    if not prefix.with_suffix(".yuv").exists():
        subprocess.run([str(tool("oracle")), str(out), str(prefix)],
                       check=True, capture_output=True)
    from easyav1_tpu.container.webm import TrackType, WebMDemuxer
    from easyav1_tpu.video.av1.backend import AV1Backend
    raw = np.fromfile(prefix.with_suffix(".yuv"), dtype=np.uint8)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    per = w * h + 2 * cw * ch
    dmx = WebMDemuxer(str(out))
    vt = dmx.tracks_of_type(TrackType.VIDEO)[0]
    be = AV1Backend(vt)
    fi = 0
    while (p := dmx.read_packet()) is not None:
        if p.track != vt.number:
            continue
        for fr in p.frames:
            for f in be.decode([fr], 0):
                off = fi * per
                for pi, (dw, dh) in enumerate(((w, h), (cw, ch),
                                               (cw, ch))):
                    gold = raw[off:off + dw * dh].reshape(dh, dw)
                    off += dw * dh
                    d = np.abs(gold.astype(int)
                               - f.data[pi].astype(int))
                    assert d.max() == 0, \
                        f"frame {fi} plane {pi} {d.max()}"
                fi += 1
    assert fi == frames


def test_lossless_intra():
    _roundtrip(96, 96, 3, 1)


def test_lossless_inter_odd():
    _roundtrip(94, 98, 5, 100)
