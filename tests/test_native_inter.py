"""Differential conformance: C inter entropy decode vs the Python
reference decoder.

For every frame of each fixture, the same tile payloads + the same
inherited CDF blob are decoded by BOTH engines; every FramePlan field
(blocks incl. mvs/warp/compound, tx records, coefficients, mi grids)
and the exported end-of-frame CDF blob must be bit-identical.  The
Python decoder is the oracle (itself dav1d-verified); this pins the C
port (native/av1_tile.c + av1_inter.h) to it exactly.
"""

import numpy as np
import pytest

import easyav1_tpu.native as nat
from easyav1_tpu.container.webm import TrackType, WebMDemuxer
from easyav1_tpu.native.cdf_layout import blob_to_cdf, cdf_to_blob
from easyav1_tpu.video.av1 import constants as C
from easyav1_tpu.video.av1.backend import AV1Backend
from easyav1_tpu.video.av1.cdf import CdfContext
from easyav1_tpu.video.av1.headers import parse_sequence_header, split_obus
from easyav1_tpu.video.av1.tile import TileDecoder

from test_av1_inter_real import inter_fixture, SCOPE_OPTS, COMP_SCOPE, \
    COMP_BASE


def _plans_equal(tag, fi, py_plan, c_plan):
    pb, cb = py_plan.blocks, c_plan.blocks
    assert len(pb) == len(cb), (tag, fi, len(pb), len(cb))
    for k, (a, b) in enumerate(zip(pb, cb)):
        for f in ("r", "c", "bsize", "y_mode", "uv_mode", "angle_y",
                  "angle_uv", "skip", "tx_size", "uv_tx_size",
                  "has_chroma", "cfl_alphas", "filter_intra", "is_inter",
                  "ref_frame", "mv", "mv2", "inter_mode", "ref_mv_idx",
                  "interp_filter", "motion_mode", "compound_type",
                  "compound_idx", "wedge_idx", "wedge_sign", "mask_type",
                  "interintra_mode", "ii_wedge", "ii_wedge_idx",
                  "skip_mode", "partition"):
            av, bv = getattr(a, f), getattr(b, f)
            if f == "ref_frame":
                av, bv = tuple(av), tuple(bv)
            assert av == bv, (tag, fi, k, f, av, bv, a.r, a.c, a.bsize)
        aw, bw = a.warp, b.warp
        assert (aw is None) == (bw is None), (tag, fi, k, "warp", aw, bw)
        if aw is not None:
            assert list(aw[0]) == list(bw[0]), (tag, fi, k, "wm")
            assert tuple(aw[1]) == tuple(bw[1]), (tag, fi, k, "shear")
        assert len(a.tx_blocks) == len(b.tx_blocks), (tag, fi, k, "ntx")
        for j, (ta, tb) in enumerate(zip(a.tx_blocks, b.tx_blocks)):
            for f in ("plane", "x", "y", "tx_size", "tx_type", "eob"):
                assert getattr(ta, f) == getattr(tb, f), \
                    (tag, fi, k, j, f, getattr(ta, f), getattr(tb, f))
            assert np.array_equal(ta.coeffs, tb.coeffs), \
                (tag, fi, k, j, "coeffs")
    for g in ("y_mode", "uv_mode", "angle_y", "angle_uv", "skip",
              "bsize"):
        assert np.array_equal(getattr(py_plan, g), getattr(c_plan, g)), \
            (tag, fi, g)
    assert py_plan.lf_txs == c_plan.lf_txs, (tag, fi, "lf_txs")
    assert py_plan.cdef_idx == c_plan.cdef_idx, (tag, fi, "cdef_idx")
    if getattr(py_plan, "ref0_grid", None) is not None \
            and getattr(c_plan, "ref0_grid", None) is not None:
        for g in ("ref0_grid", "ref1_grid", "mvs_grid", "interp_grid"):
            assert np.array_equal(getattr(py_plan, g),
                                  getattr(c_plan, g)), (tag, fi, g)


def _diff_stream(tag, **kw):
    lib = nat._load()
    if lib is None:
        pytest.skip("native library unavailable")
    out, _prefix = inter_fixture(tag, **kw)
    dmx = WebMDemuxer(str(out))
    vt = dmx.tracks_of_type(TrackType.VIDEO)[0]
    pkts = []
    while (p := dmx.read_packet()) is not None:
        if p.track == vt.number:
            pkts.extend(p.frames)
    be = AV1Backend(vt)   # drives header parse + ref plane state
    seq = None
    fi = 0
    for pk in pkts:
        for obu in split_obus(pk):
            if obu.type == C.OBU_SEQUENCE_HEADER:
                be.seq = parse_sequence_header(obu.payload)
                from easyav1_tpu.video.av1.headers import HeaderParser
                be.hp = HeaderParser(be.seq)
                seq = be.seq
            elif obu.type == C.OBU_FRAME:
                hdr = be._parse_frame_header(obu.payload)
                byte_off = (hdr.header_bit_offset + 7) // 8
                tiles = be._split_tiles(hdr, [obu.payload[byte_off:]])
                init_blob = None
                if hdr.primary_ref_frame != C.PRIMARY_REF_NONE:
                    init_blob = be._ref_cdfs[
                        hdr.ref_frame_idx[hdr.primary_ref_frame]]
                tpl = None
                if hdr.use_ref_frame_mvs:
                    from easyav1_tpu.video.av1.mfmv import \
                        setup_motion_field
                    tpl = setup_motion_field(
                        hdr, seq,
                        [s if s.valid else None for s in be.hp.refs],
                        be._ref_tmvs)
                # --- Python reference decode ---
                py_plan = be._empty_plan(hdr)
                init_cdf = (blob_to_cdf(init_blob) if init_blob
                            else CdfContext.default(hdr.quant.base_q_idx))
                end_cdf = init_cdf
                dec = TileDecoder(seq, hdr, init_cdf, py_plan)
                if tpl is not None:
                    dec.tpl_mv, dec.tpl_off = tpl
                n_cols = hdr.tile.cols
                utid = hdr.tile.context_update_tile_id
                for tn, tdata in enumerate(tiles):
                    tcdf = init_cdf.copy()
                    dec.cdf = tcdf.t
                    dec.decode_tile(tdata, tn // n_cols, tn % n_cols)
                    if tn == utid and not hdr.disable_frame_end_update_cdf:
                        end_cdf = tcdf
                end_cdf.reset_counters()
                py_blob = cdf_to_blob(end_cdf)
                # --- C decode ---
                c_plan = be._empty_plan(hdr)
                blob = nat.decode_frame_native(
                    seq, hdr, c_plan, tiles, cdf_in=init_blob,
                    want_cdf=True, tpl=tpl)
                assert blob is not None, (tag, fi, "C decoder declined")
                _plans_equal(tag, fi, py_plan, c_plan)
                assert blob == py_blob, (tag, fi, "end CDF blob differs")
                # feed the backend's normal decode to advance ref state
                be._decode_frame(hdr, [obu.payload[byte_off:]], 0)
                # rewind: _decode_frame re-parses? No — it consumed hdr;
                # refs were updated inside.
                fi += 1
    assert fi > 0, "no frames compared"


# fixture parameter sets mirror test_av1_inter_real exactly, so the
# cached fixtures (and their oracle decodes) are shared between suites
def test_native_inter_plain():
    _diff_stream("plain", extra=(
        "vopt:aom-params=enable-order-hint=0:enable-obmc=0:"
        "enable-warped-motion=0:enable-global-motion=0",))


def test_native_inter_mm():
    _diff_stream("mm", crf=30, frames=6, extra=(
        "vopt:aom-params=enable-order-hint=0:enable-global-motion=0",))


def test_native_inter_inh():
    _diff_stream("inh", crf=24, extra=(
        "vopt:aom-params=enable-order-hint=0:enable-obmc=0:"
        "enable-warped-motion=0:enable-global-motion=0",))


def test_native_inter_tmv():
    _diff_stream("tmv", crf=30, frames=6, extra=(
        "vopt:aom-params=enable-order-hint=1:enable-ref-frame-mvs=1:"
        "enable-global-motion=0",))


def test_native_inter_full():
    _diff_stream("full", crf=36, frames=8, extra=(
        "vopt:aom-params=enable-order-hint=1:enable-ref-frame-mvs=1:"
        "enable-global-motion=0",))


def test_native_inter_comp_basic():
    _diff_stream("comp_basic", frames=6, scope=COMP_SCOPE, extra=(
        "vopt:aom-params=" + COMP_BASE + ":enable-dist-wtd-comp=0:"
        "enable-obmc=0:enable-warped-motion=0:enable-global-motion=0",))


def test_native_inter_comp_jnt():
    _diff_stream("comp_jnt", frames=6, scope=COMP_SCOPE, extra=(
        "vopt:aom-params=" + COMP_BASE,))
