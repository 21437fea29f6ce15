"""Pallas intra executor vs the numpy reference (interpret mode).

Random pred-unit programs (all classes, edge filters, upsampling,
zone1/2/3 angles, CfL with clipped non-pow2 ac blocks) are replayed by
both exec_ref.UnitExecutor and the pallas strip kernel; outputs must be
bit-identical.  Runs the Mosaic interpreter on CPU — the same kernel
compiles for TPU in the device pipeline.  Seeds include past
regressions: zone2 left base_y < -2 clamp, upsample interleave
(pltpu.repeat is tile-like), edge slot -2 zero-init.
"""

import numpy as np
import pytest

from easyav1_tpu.video.av1.recon.exec_ref import UnitExecutor
from easyav1_tpu.video.av1.recon import jax_exec as JX
from easyav1_tpu.video.av1.recon import intra_pallas as IP

MIR, MIC = 30, 26
SSX = SSY = 1


def _base_layer(plane):
    ph = (MIR * 4) >> (SSY if plane else 0)
    pw = (MIC * 4) >> (SSX if plane else 0)
    out = []
    for y in range(0, ph, 16):
        for x in range(0, pw, 16):
            w = min(16, pw - x) // 4 * 4
            h = min(16, ph - y) // 4 * 4
            out.append([plane, x, y, w, h, 0, 0, int(y > 0),
                        int(x > 0), 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                        0, 0, 0, 0])
    return np.array(out, np.int32)


def _rand_units(n, plane, rng):
    ph = (MIR * 4) >> (SSY if plane else 0)
    pw = (MIC * 4) >> (SSX if plane else 0)
    sh = 64 >> (1 if plane else 0)
    units = []
    for _ in range(n):
        w = min(int(2 ** rng.integers(2, 6)), 32)
        h = min(int(2 ** rng.integers(2, 6)), 32)
        x = int(rng.integers(0, (pw - w) // 4 + 1)) * 4
        strip = int(rng.integers(0, ph // sh))
        y = strip * sh + int(rng.integers(0, (sh - h) // 4 + 1)) * 4
        y = min(y, ph - h)
        cls = int(rng.integers(0, 9))
        ang = 0
        if cls == 3:
            zone = rng.integers(0, 3)
            rngs = {0: range(36, 88, 3), 1: range(93, 178, 3),
                    2: range(183, 268, 3)}[int(zone)]
            ang = int(rng.choice(list(rngs)))
        ha, hl = int(y > 0), int(x > 0)
        htr = int(rng.integers(0, 2)) if ha else 0
        hbl = int(rng.integers(0, 2)) if hl else 0
        if hbl and (y % sh) + 2 * h > sh:
            hbl = 0
        sa = int(rng.integers(0, 4)) if cls == 3 else 0
        sl = int(rng.integers(0, 4)) if cls == 3 else 0
        ua = int(rng.integers(0, 2)) if cls == 3 and w + h <= 16 else 0
        ul = int(rng.integers(0, 2)) if cls == 3 and w + h <= 16 else 0
        cf = int(rng.integers(0, 2)) \
            if cls == 3 and 90 < ang < 180 and ha and hl else 0
        alpha = acx = acy = acw = ach = 0
        if cls == 8 and plane:
            alpha = int(rng.integers(-16, 17))
            offx = 4 * int(rng.integers(0, 2)) \
                if (x >= 4 and w <= 28) else 0
            offy = 4 * int(rng.integers(0, 2)) \
                if (y % sh >= 4 and h <= 28) else 0
            acx, acy = x - offx, y - offy
            acw, ach = offx + w, offy + h
            if rng.integers(0, 2) and ach > 4:
                ach -= 4
            if rng.integers(0, 2) and acw > 4:
                acw -= 4
        units.append([plane, x, y, w, h, cls, ang, ha, hl, htr, hbl,
                      sa, sl, ua, ul, cf, alpha, acx, acy, acw, ach,
                      0, 0, 0])
    return np.array(units, np.int32)


@pytest.mark.parametrize("seed", [301, 304, 305, 317, 310])
def test_pallas_vs_exec_ref(seed):
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    plane = int(rng.integers(0, 3))
    base = _base_layer(plane)
    rand = _rand_units(8, plane, rng)
    sh = 64 >> (1 if plane else 0)
    nstrip = -(-((MIR * 4) >> (1 if plane else 0)) // sh)
    parts = []
    for st in range(nstrip):
        parts.append(base[base[:, 2] // sh == st])
        parts.append(rand[rand[:, 2] // sh == st])
    units = np.concatenate(parts)

    ex = UnitExecutor(MIR, MIC, SSX, SSY, 8, 3)
    resid = [rng.integers(-50, 51, d).astype(np.int64)
             for d in ex.dims]
    gold = ex.run(units, resid)

    pr = JX.PallasRecon(MIR, MIC, SSX, SSY, 8, 3, interpret=True)
    fields = JX.preprocess_units(units, pr.dims, pad=0)
    hp, wp, ns = pr.layouts[plane]
    ph, pw = pr.dims[plane]
    rp = np.zeros((hp, wp), np.int32)
    rp[:ph, IP.LPAD:IP.LPAD + pw] = resid[plane]
    u3, cnt, umax = pr._strip_fields(fields[plane], plane)
    if plane == 0:
        k = IP.make_strip_kernel(pr.strips[0], wp, ns, umax, 8,
                                 False, 0, True)
        out = k(jnp.asarray(u3), jnp.asarray(cnt), jnp.asarray(rp))
    else:
        hp0, wp0, _ = pr.layouts[0]
        lum = np.zeros((hp0, wp0), np.int32)
        lum[:pr.dims[0][0], IP.LPAD:IP.LPAD + pr.dims[0][1]] = \
            ex.planes[0]
        k = IP.make_strip_kernel(pr.strips[plane], wp, ns, umax, 8,
                                 True, wp0, True)
        out = k(jnp.asarray(u3), jnp.asarray(cnt), jnp.asarray(rp),
                jnp.asarray(lum))
    got = np.asarray(out)[:ph, IP.LPAD:IP.LPAD + pw]
    d = np.abs(got.astype(np.int64) - gold[plane])
    assert d.max() == 0, (
        f"plane {plane}: maxdiff {d.max()} at "
        f"{np.argwhere(d > 0)[:4].tolist()}")


def test_pallas_lossless_safe():
    """Lossless (WHT) frames may now run on the pallas pipe (the host
    residual composer handles itx_wht4); frames the executor still
    declines must fall back to C bit-exactly either way."""
    import os

    import numpy as np
    from fixtures import make_fixture
    from easyav1_tpu.container import TrackType, WebMDemuxer
    from easyav1_tpu.video.av1.backend import AV1Backend

    fx = make_fixture(w=128, h=96, fps=10, frames=3, gop=1, crf=0,
                      audio_secs=0, vopt=["lossless=1"])

    def dec(pipe):
        os.environ["EASYAV1_PIPE"] = pipe
        try:
            d = WebMDemuxer(str(fx))
            vt = d.tracks_of_type(TrackType.VIDEO)[0]
            pkts = []
            while (p := d.read_packet()) is not None:
                if p.track == vt.number:
                    pkts.extend(p.frames)
            be = AV1Backend(vt)
            out = []
            for pk in pkts:
                for f in be.decode([pk], 0):
                    out.append([np.asarray(pl).copy() for pl in f.data])
            return out
        finally:
            os.environ["EASYAV1_PIPE"] = "native"

    a = dec("native")
    b = dec("pallas")
    assert len(a) == len(b) == 3
    for fa, fb in zip(a, b):
        for x, y in zip(fa, fb):
            assert np.array_equal(x, y)


def test_pallas_palette_runs_exact():
    """Palette intra frames through the strip executor must match the
    native decode exactly (round 5: palette runs on device via cls-10
    literal units; before that this guarded the decline against a
    silent-DC corruption found in round 4)."""
    import os

    import numpy as np
    from test_av1_palette_synth import W, H, _pal_block
    from easyav1_tpu.video.av1.av1_enc import EncBlock, encode_frame
    from easyav1_tpu.video.av1 import constants as C
    from easyav1_tpu.container.webm import TrackInfo
    from easyav1_tpu.video.av1.backend import AV1Backend

    rng = np.random.default_rng(0)
    blocks = []
    for r in range(0, 16, 4):
        for c in range(0, 16, 4):
            if (r, c) == (0, 0):
                blocks.append(_pal_block(0, 0, C.BLOCK_16X16, 4, 1))
            else:
                blocks.append(EncBlock(
                    r=r, c=c, bsize=C.BLOCK_16X16, skip=False,
                    luma_coeffs=[[(int(rng.integers(1, 9)), 0)
                                  for _ in range(4)]]))
    tu = encode_frame(W, H, 60, blocks, adapt=True, screen=True)

    def dec(pipe):
        os.environ["EASYAV1_PIPE"] = pipe
        try:
            be = AV1Backend(TrackInfo(number=1, type=None,
                                      codec_id="V_AV1"))
            f = be.decode([tu], 0)[0]
            return [np.asarray(p).copy() for p in f.data]
        finally:
            os.environ["EASYAV1_PIPE"] = "native"

    a = dec("native")
    b = dec("pallas")
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_pallas_intrabc_runs_exact():
    """allow_intrabc frames through the device pipe must match the
    native decode exactly (round 5: intrabc runs on the jax scan
    executor via cls-11 units; before that this guarded the decline
    against a silent zero-pixels corruption found in round 4)."""
    import os

    import numpy as np
    import test_av1_intrabc as TI
    from easyav1_tpu.video.av1 import constants as C
    from easyav1_tpu.container.webm import TrackInfo
    from easyav1_tpu.video.av1.backend import AV1Backend

    rng = np.random.default_rng(3)
    blocks = TI._intra_fill(rng, 48)
    placed = 0
    for c in range(0, 16, 4):
        dv = ((0 - 48) * 4 * 8, 0)
        if TI.dv_valid(48, c, C.BLOCK_16X16, dv):
            blocks.append(TI.EncBlock(r=48, c=c, bsize=C.BLOCK_16X16,
                                      skip=True, dv=dv))
            placed += 1
    for r in range(48, TI.H // 4, 4):
        for c in range(0, TI.W // 4, 4):
            if r == 48 and c < placed * 4:
                continue
            blocks.append(TI.EncBlock(r=r, c=c, bsize=C.BLOCK_16X16,
                                      skip=True))
    assert placed > 0
    tu = TI.encode_frame(TI.W, TI.H, 60, blocks, intrabc=True)

    def dec(pipe):
        os.environ["EASYAV1_PIPE"] = pipe
        try:
            be = AV1Backend(TrackInfo(number=1, type=None,
                                      codec_id="V_AV1"))
            f = be.decode([tu], 0)[0]
            return [np.asarray(p).copy() for p in f.data]
        finally:
            os.environ["EASYAV1_PIPE"] = "native"

    a = dec("native")
    b = dec("pallas")
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_pallas_format_sweep_safe():
    """Every pixel format either runs on the strip executor or
    declines to C — output must match the native path regardless
    (round-4 audit after two silent-corruption finds)."""
    import os

    import numpy as np
    from test_av1_hbd import BASE, fixture
    from easyav1_tpu.container import TrackType, WebMDemuxer
    from easyav1_tpu.video.av1.backend import AV1Backend

    for tag, kv in (("444i", dict(ss=444)), ("422i", dict(ss=422)),
                    ("monoi", dict(ss="mono")),
                    ("10bi", dict(bitdepth=10))):
        fx = fixture(tag, **BASE, gop=1, **kv)

        def dec(pipe):
            os.environ["EASYAV1_PIPE"] = pipe
            try:
                d = WebMDemuxer(str(fx))
                vt = d.tracks_of_type(TrackType.VIDEO)[0]
                pkts = []
                while (p := d.read_packet()) is not None:
                    if p.track == vt.number:
                        pkts.extend(p.frames)
                be = AV1Backend(vt)
                out = []
                for pk in pkts[:4]:
                    for f in be.decode([pk], 0):
                        out.append([np.asarray(pl).copy()
                                    for pl in f.data])
                return out
            finally:
                os.environ["EASYAV1_PIPE"] = "native"

        a = dec("native")
        b = dec("pallas")
        assert len(a) == len(b) > 0, tag
        for fa, fb in zip(a, b):
            for x, y in zip(fa, fb):
                assert np.array_equal(x, y), tag


def test_pallas_format_sweep_inter():
    """Same run-or-decline-must-match audit for INTER frames through
    the device MC path (gop spans the whole clip so frames 2+ are
    inter; round-4 audit companion to the intra sweep above)."""
    import os

    import numpy as np
    from test_av1_hbd import BASE, fixture
    from easyav1_tpu.container import TrackType, WebMDemuxer
    from easyav1_tpu.video.av1.backend import AV1Backend

    for tag, kv in (("444p", dict(ss=444)), ("422p", dict(ss=422)),
                    ("monop", dict(ss="mono")),
                    ("10bp", dict(bitdepth=10))):
        fx = fixture(tag, **BASE, gop=100, **kv)

        def dec(pipe):
            os.environ["EASYAV1_PIPE"] = pipe
            try:
                d = WebMDemuxer(str(fx))
                vt = d.tracks_of_type(TrackType.VIDEO)[0]
                pkts = []
                while (p := d.read_packet()) is not None:
                    if p.track == vt.number:
                        pkts.extend(p.frames)
                be = AV1Backend(vt)
                out = []
                for pk in pkts[:5]:
                    for f in be.decode([pk], 0):
                        out.append([np.asarray(pl).copy()
                                    for pl in f.data])
                return out
            finally:
                os.environ["EASYAV1_PIPE"] = "native"

        a = dec("native")
        b = dec("pallas")
        assert len(a) == len(b) > 0, tag
        for fa, fb in zip(a, b):
            for x, y in zip(fa, fb):
                assert np.array_equal(x, y), tag
