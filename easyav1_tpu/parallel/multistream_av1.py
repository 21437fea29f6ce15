"""Real multi-stream AV1 decode with a mesh-sharded device postfilter.

BASELINE config-5 shape (N concurrent streams batched on one chip /
mesh), on REAL bitstream content: each stream is a genuine AV1
temporal unit (from the in-repo synthetic encoder or any other
source), entropy-decoded and reconstructed by the production host
pipeline; the deblocking + CDEF postfilter then runs ONCE for all
streams as a vmapped jit whose stream axis is sharded over the mesh's
``dp`` axis (independent streams: XLA keeps the step collective-free,
each device filters its own streams' planes).

Used by ``__graft_entry__.dryrun_multichip`` and
``tests/test_multistream.py``; both validate the sharded result
bit-exactly against each stream's ordinary single-stream decode.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from easyav1_tpu.video.av1 import constants as C


def make_stream_tu(s: int, w: int = 64, h: int = 64) -> bytes:
    """A small real AV1 intra temporal unit with per-stream content,
    quantizer, loop-filter levels and CDEF strengths."""
    from easyav1_tpu.video.av1.av1_enc import EncBlock, encode_frame

    rng = np.random.default_rng(1000 + s)
    blocks = []
    for r in range(0, h // 4, 4):
        for c in range(0, w // 4, 4):
            n = int(rng.integers(2, 9))
            coeffs = [[(int(rng.integers(1, 12)),
                        int(rng.integers(0, 2))) for _ in range(n)]]
            blocks.append(EncBlock(r=r, c=c, bsize=C.BLOCK_16X16,
                                   skip=False, luma_coeffs=coeffs))
    lf = (2 + (s % 4), 1 + (s % 3))
    cdef = (3, [(1 + (s % 3), 1, 2 - (s & 1), 1)])
    return encode_frame(w, h, 36 + 2 * s, blocks, lf_levels=lf,
                        cdef=cdef)


def decode_tu_unfiltered(tu: bytes):
    """Production python decode of one TU with the postfilters NOT
    applied: returns (seq, hdr, plan, aligned_planes)."""
    from easyav1_tpu.container.webm import TrackInfo
    from easyav1_tpu.video.av1.backend import AV1Backend
    from easyav1_tpu.video.av1.cdf import CdfContext
    from easyav1_tpu.video.av1.headers import (parse_sequence_header,
                                               split_obus, HeaderParser)
    from easyav1_tpu.video.av1.recon_ref import FrameRecon
    from easyav1_tpu.video.av1.tile import FramePlan, TileDecoder

    be = AV1Backend(TrackInfo(number=1, type=None, codec_id="V_AV1"))
    hdr = None
    tiles = None
    for obu in split_obus(tu):
        if obu.type == C.OBU_SEQUENCE_HEADER:
            be.seq = parse_sequence_header(obu.payload)
            be.hp = HeaderParser(be.seq)
        elif obu.type == C.OBU_FRAME:
            hdr = be._parse_frame_header(obu.payload)
            byte_off = (hdr.header_bit_offset + 7) // 8
            tiles = be._split_tiles(hdr, [obu.payload[byte_off:]])
    seq = be.seq
    plan = FramePlan(
        width=hdr.upscaled_width, height=hdr.frame_height,
        mi_cols=hdr.mi_cols, mi_rows=hdr.mi_rows,
        subsampling_x=seq.color.subsampling_x,
        subsampling_y=seq.color.subsampling_y,
        y_mode=np.zeros((hdr.mi_rows, hdr.mi_cols), np.int8),
        uv_mode=np.zeros((hdr.mi_rows, hdr.mi_cols), np.int8),
        angle_y=np.zeros((hdr.mi_rows, hdr.mi_cols), np.int8),
        angle_uv=np.zeros((hdr.mi_rows, hdr.mi_cols), np.int8),
        skip=np.zeros((hdr.mi_rows, hdr.mi_cols), np.int8),
        bsize=np.zeros((hdr.mi_rows, hdr.mi_cols), np.int8),
    )
    cdf = CdfContext.default(hdr.quant.base_q_idx)
    dec = TileDecoder(seq, hdr, cdf, plan)
    for tn, td in enumerate(tiles):
        dec.decode_tile(td, tn // hdr.tile.cols, tn % hdr.tile.cols)
    recon = FrameRecon(seq, hdr, plan)
    aligned = recon.run_aligned()
    return seq, hdr, plan, aligned


def _cdef_idx_grid(plan, mi_rows, mi_cols):
    gh = (mi_rows + 15) // 16
    gw = (mi_cols + 15) // 16
    g = np.full((gh, gw), -1, np.int32)
    for (r, c), idx in plan.cdef_idx.items():
        g[r // 16, c // 16] = idx
    return g


def batched_postfilter(mesh, frames):
    """frames: list of (seq, hdr, plan, aligned_planes) sharing
    geometry and bitdepth.  Runs LF + CDEF for all streams in one
    vmapped jit sharded over the mesh's dp axis; returns per-stream
    filtered planes (numpy)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from easyav1_tpu.video.av1.lf_ref import LoopFilter
    from easyav1_tpu.video.av1.recon.cdef_jax import unit_maps
    from easyav1_tpu.video.av1.recon.postfilter_fused import (
        _cdef_stage, _lf_size_maps, _lf_stage)

    seq0, hdr0, _, planes0 = frames[0]
    bd = seq0.color.bitdepth
    num_planes = len(planes0)
    dims = tuple((int(p.shape[0]), int(p.shape[1])) for p in planes0)
    ssx, ssy = seq0.color.subsampling_x, seq0.color.subsampling_y
    damping = frames[0][1].cdef.damping + (bd - 8)

    per_stream = []
    for seq, hdr, plan, planes in frames:
        assert hdr.cdef.damping == hdr0.cdef.damping, \
            "streams must share cdef damping (vary strengths instead)"
        lf = LoopFilter(hdr, seq, plan, bd)

        def grids_for(p, shape, lf=lf):
            return lf._build_grids(p, shape)

        sv, sh_, lv, lh = _lf_size_maps(hdr, bd, dims, num_planes,
                                        grids_for)
        cd = hdr.cdef
        cs = bd - 8
        filt, idxm = unit_maps(
            plan.skip, _cdef_idx_grid(plan, hdr.mi_rows, hdr.mi_cols),
            hdr.mi_rows, hdr.mi_cols)
        safe = np.where(idxm >= 0, idxm, 0)
        sel = filt != 0
        mk = lambda v: (np.where(sel, np.array(v, np.int32)[safe], 0)
                        << cs).astype(np.int32)
        per_stream.append((
            [np.ascontiguousarray(p, np.int32) for p in planes],
            sv, sh_, lv, lh,
            mk(cd.y_pri_strength), mk(cd.y_sec_strength),
            mk(cd.uv_pri_strength), mk(cd.uv_sec_strength),
            filt.astype(np.int32)))

    # stack every leaf along the stream axis
    stacked = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)),
                           *per_stream)

    lf_fn = _lf_stage(dims, bd)
    cd_fn = _cdef_stage(dims, bd, ssx, ssy, damping, True)

    def one(args):
        planes, sv, sh_, lv, lh, py, sy, pu, su, filt = args
        x = lf_fn(planes, sv, sh_, lv, lh)
        return cd_fn(x, py, sy, pu, su, filt)

    shard = NamedSharding(mesh, P("dp"))
    step = jax.jit(jax.vmap(one), in_shardings=(shard,),
                   out_shardings=shard)
    out = step(stacked)
    return [[np.asarray(out[p][s]) for p in range(num_planes)]
            for s in range(len(frames))]


def run_multistream(mesh, n_streams: int, w: int = 64, h: int = 64,
                    check: bool = True) -> int:
    """End-to-end: synthesize + decode n_streams real AV1 streams,
    batch the device postfilter over the mesh, and (optionally) verify
    each stream bit-exact vs its ordinary single-stream decode.
    Returns the number of verified streams."""
    from easyav1_tpu.container.webm import TrackInfo
    from easyav1_tpu.video.av1.backend import AV1Backend

    tus = [make_stream_tu(s, w, h) for s in range(n_streams)]
    frames = [decode_tu_unfiltered(tu) for tu in tus]
    filtered = batched_postfilter(mesh, frames)
    if not check:
        return n_streams
    for s, tu in enumerate(tus):
        be = AV1Backend(TrackInfo(number=1, type=None,
                                  codec_id="V_AV1"))
        ref = be.decode([tu], 0)[0]
        hdr = frames[s][1]
        hh, ww = hdr.frame_height, hdr.upscaled_width
        cw = (ww + frames[s][0].color.subsampling_x) >> \
            frames[s][0].color.subsampling_x
        chh = (hh + frames[s][0].color.subsampling_y) >> \
            frames[s][0].color.subsampling_y
        crops = ((hh, ww), (chh, cw), (chh, cw))
        for p in range(len(ref.data)):
            got = filtered[s][p][:crops[p][0], :crops[p][1]]
            want = np.asarray(ref.data[p]).astype(np.int32)
            d = np.abs(got - want)
            assert d.max() == 0, (
                f"stream {s} plane {p}: maxdiff {d.max()} at "
                f"{np.argwhere(d > 0)[:4].tolist()}")
    return n_streams
