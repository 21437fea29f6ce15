"""Native (C) hot-path bindings via ctypes.

The AV1 tile symbol decoder is the sequential Amdahl bottleneck of the
decode pipeline (SURVEY.md §2d: msac/entropy decode stays on the host;
the reference keeps it in hand-tuned C/asm).  `decode_tile_native`
produces the exact same FramePlan as the Python TileDecoder; tests
assert bit-identical output on the full fixture corpus.

The shared library is rebuilt on import when sources are newer (plain
gcc; no external build deps).  If no compiler is available the import
still succeeds and `available()` returns False — callers fall back to
the Python tile decoder.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libeasyav1.so")
_SRCS = [os.path.join(_DIR, "av1_tile.c"), os.path.join(_DIR, "av1_recon.c"),
         os.path.join(_DIR, "vorbis_dec.c")]
_HDRS = [os.path.join(_DIR, n) for n in
         ("av1_tables.h", "av1_common.h", "av1_itx.h", "av1_lf.h",
          "av1_cdef.h")]


class _TileParams(ctypes.Structure):
    _fields_ = [(n, ctypes.c_int32) for n in (
        "mi_rows", "mi_cols", "sb128", "bitdepth", "num_planes", "ssx",
        "ssy", "base_q_idx", "dq_y_dc", "dq_u_dc", "dq_u_ac", "dq_v_dc",
        "dq_v_ac", "tx_mode", "reduced_tx_set", "coded_lossless",
        "allow_update_cdf", "enable_cdef", "cdef_bits",
        "enable_filter_intra", "allow_intrabc", "delta_q_present",
        "delta_q_res", "delta_lf_present", "delta_lf_multi", "col_start",
        "col_end", "row_start", "row_end", "qctx")]


class _TileOut(ctypes.Structure):
    _fields_ = [
        ("y_mode", ctypes.c_void_p), ("uv_mode", ctypes.c_void_p),
        ("angle_y", ctypes.c_void_p), ("angle_uv", ctypes.c_void_p),
        ("skip", ctypes.c_void_p), ("bsize", ctypes.c_void_p),
        ("blocks", ctypes.c_void_p),
        ("max_blocks", ctypes.c_int64), ("n_blocks", ctypes.c_int64),
        ("txs", ctypes.c_void_p),
        ("max_txs", ctypes.c_int64), ("n_txs", ctypes.c_int64),
        ("coeffs", ctypes.c_void_p),
        ("coeffs_cap", ctypes.c_int64), ("coeffs_used", ctypes.c_int64),
        ("lf_txs", ctypes.c_void_p),
        ("max_lf", ctypes.c_int64), ("n_lf", ctypes.c_int64),
        ("cdef_idx", ctypes.c_void_p),
        ("error", ctypes.c_int32),
    ]


class _ReconParams(ctypes.Structure):
    _fields_ = [
        ("bitdepth", ctypes.c_int32), ("num_planes", ctypes.c_int32),
        ("ssx", ctypes.c_int32), ("ssy", ctypes.c_int32),
        ("mi_rows", ctypes.c_int32), ("mi_cols", ctypes.c_int32),
        ("enable_intra_edge_filter", ctypes.c_int32),
        ("lf_level", ctypes.c_int32 * 4),
        ("lf_sharpness", ctypes.c_int32),
        ("lf_delta_enabled", ctypes.c_int32),
        ("lf_ref_delta_intra", ctypes.c_int32),
        ("enable_cdef", ctypes.c_int32),
        ("cdef_damping", ctypes.c_int32),
        ("cdef_y_pri", ctypes.c_int32 * 8),
        ("cdef_y_sec", ctypes.c_int32 * 8),
        ("cdef_uv_pri", ctypes.c_int32 * 8),
        ("cdef_uv_sec", ctypes.c_int32 * 8),
        ("coded_lossless", ctypes.c_int32),
        ("allow_intrabc", ctypes.c_int32),
        ("frame_width", ctypes.c_int32),
        ("frame_height", ctypes.c_int32),
    ]


_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        newest_src = max(os.path.getmtime(f) for f in _SRCS + _HDRS)
    except OSError:
        return False
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= newest_src:
        return True
    try:
        r = subprocess.run(
            ["gcc", "-O3", "-funroll-loops", "-march=native", "-shared",
             "-fPIC", "-o", _SO] + _SRCS,
            capture_output=True, timeout=120)
        return r.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("EASYAV1_NATIVE", "1") == "0":
        return None
    if not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.av1_decode_tile.restype = ctypes.c_int
    lib.av1_decode_tile.argtypes = [
        ctypes.POINTER(_TileParams), ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(_TileOut)]
    lib.av1_recon_frame.restype = ctypes.c_int
    lib.av1_recon_frame.argtypes = [
        ctypes.POINTER(_ReconParams), ctypes.POINTER(_TileOut),
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.av1_lf_grids_export.restype = ctypes.c_int
    lib.av1_lf_grids_export.argtypes = [
        ctypes.POINTER(_ReconParams), ctypes.POINTER(_TileOut),
        ctypes.c_int, ctypes.c_int, ctypes.c_int] + [ctypes.c_void_p] * 5
    lib.av1_export_pred_units.restype = ctypes.c_int
    lib.av1_export_pred_units.argtypes = [
        ctypes.POINTER(_ReconParams), ctypes.POINTER(_TileOut),
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.vorbis_create.restype = ctypes.c_void_p
    lib.vorbis_create.argtypes = [ctypes.c_char_p, ctypes.c_long]
    lib.vorbis_destroy.restype = None
    lib.vorbis_destroy.argtypes = [ctypes.c_void_p]
    lib.vorbis_decode_packet.restype = ctypes.c_int
    lib.vorbis_decode_packet.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _qctx(base_q_idx: int) -> int:
    if base_q_idx <= 20:
        return 0
    if base_q_idx <= 60:
        return 1
    if base_q_idx <= 120:
        return 2
    return 3


def _run_tiles(lib, seq, hdr, tiles):
    """Run the C tile decoder over all tiles; returns (TileOut, bufs)
    or None.  Single-tile frames only (the Python reference carries
    adapted CDFs across tiles; the C decoder re-inits per call)."""
    if len(tiles) != 1:
        return None
    if not hdr.frame_is_intra:
        # inter frames run through the Python pipeline for now
        return None
    if getattr(hdr, "allow_screen_content_tools", False):
        # screen-content syntax (palette flags, intrabc) is not in the
        # C tile decoder yet
        return None
    if getattr(hdr, "use_superres", False):
        # superres upscaling runs in the Python pipeline for now
        return None
    mi_rows, mi_cols = hdr.mi_rows, hdr.mi_cols
    q = hdr.quant
    p = _TileParams(
        mi_rows=mi_rows, mi_cols=mi_cols,
        sb128=1 if seq.use_128x128_superblock else 0,
        bitdepth=seq.color.bitdepth, num_planes=seq.color.num_planes,
        ssx=seq.color.subsampling_x, ssy=seq.color.subsampling_y,
        base_q_idx=q.base_q_idx, dq_y_dc=q.delta_q_y_dc,
        dq_u_dc=q.delta_q_u_dc, dq_u_ac=q.delta_q_u_ac,
        dq_v_dc=q.delta_q_v_dc, dq_v_ac=q.delta_q_v_ac,
        tx_mode=hdr.tx_mode, reduced_tx_set=int(hdr.reduced_tx_set),
        coded_lossless=int(hdr.coded_lossless),
        allow_update_cdf=0 if hdr.disable_cdf_update else 1,
        enable_cdef=int(getattr(seq, "enable_cdef", False)),
        cdef_bits=hdr.cdef.bits if hdr.cdef else 0,
        enable_filter_intra=int(getattr(seq, "enable_filter_intra", False)),
        allow_intrabc=int(getattr(hdr, "allow_intrabc", False)),
        delta_q_present=int(hdr.delta_q_present),
        delta_q_res=hdr.delta_q_res,
        delta_lf_present=int(getattr(hdr, "delta_lf_present", False)),
        delta_lf_multi=int(getattr(hdr, "delta_lf_multi", False)),
        qctx=_qctx(q.base_q_idx),
    )

    n_mi = mi_rows * mi_cols
    max_blocks = n_mi + 64
    max_txs = 3 * n_mi + 64
    max_lf = 3 * n_mi + 64
    coeffs_cap = 2 * n_mi * 16 + 4096
    # buffer pool keyed by mi dims — the C decoder overwrites every
    # consumed element, so reuse without re-zeroing (cdef grid excepted)
    key = (mi_rows, mi_cols)
    bufs = _BUF_POOL.get(key)
    if bufs is None:
        bufs = {
            "grids": {k: np.empty((mi_rows, mi_cols), np.int8)
                      for k in ("y_mode", "uv_mode", "angle_y", "angle_uv",
                                "skip", "bsize")},
            "blocks": np.empty((max_blocks, 16), np.int32),
            "txs": np.empty((max_txs, 8), np.int32),
            "coeffs": np.empty(coeffs_cap, np.int32),
            "lf": np.empty((max_lf, 4), np.int32),
            "cdef": np.empty(((mi_rows + 15) // 16, (mi_cols + 15) // 16),
                             np.int8),
        }
        _BUF_POOL[key] = bufs
    bufs["cdef"].fill(-1)
    grids = bufs["grids"]

    out = _TileOut(
        y_mode=_vp(grids["y_mode"]), uv_mode=_vp(grids["uv_mode"]),
        angle_y=_vp(grids["angle_y"]), angle_uv=_vp(grids["angle_uv"]),
        skip=_vp(grids["skip"]), bsize=_vp(grids["bsize"]),
        blocks=_vp(bufs["blocks"]), max_blocks=max_blocks, n_blocks=0,
        txs=_vp(bufs["txs"]), max_txs=max_txs, n_txs=0,
        coeffs=_vp(bufs["coeffs"]), coeffs_cap=coeffs_cap, coeffs_used=0,
        lf_txs=_vp(bufs["lf"]), max_lf=max_lf, n_lf=0,
        cdef_idx=_vp(bufs["cdef"]), error=0)

    sb_shift = 5 if seq.use_128x128_superblock else 4
    t = hdr.tile
    p.col_start = min(t.col_starts[0] << sb_shift, mi_cols)
    p.col_end = min(t.col_starts[1] << sb_shift, mi_cols)
    p.row_start = min(t.row_starts[0] << sb_shift, mi_rows)
    p.row_end = min(t.row_starts[1] << sb_shift, mi_rows)
    rc = lib.av1_decode_tile(ctypes.byref(p), tiles[0], len(tiles[0]),
                             ctypes.byref(out))
    if rc != 0:
        return None
    return out, bufs


def _vp(a):
    return a.ctypes.data_as(ctypes.c_void_p)


_BUF_POOL: dict = {}


def decode_frame_native(seq, hdr, plan, tiles: List[bytes]) -> bool:
    """Decode all tiles of an intra frame into `plan` using the C
    decoder.  Returns False (plan untouched) when the native path is
    unavailable or reports an error; caller falls back to Python."""
    lib = _load()
    if lib is None:
        return False
    res = _run_tiles(lib, seq, hdr, tiles)
    if res is None:
        return False
    out, bufs = res
    from easyav1_tpu.video.av1 import constants as C
    from easyav1_tpu.video.av1 import tables as T
    from easyav1_tpu.video.av1.tile import BlockRecord, TxBlock

    coeffs_buf = bufs["coeffs"]
    txs = bufs["txs"]
    for b in bufs["blocks"][:out.n_blocks]:
        (br, bc, bsize, y_mode, uv_mode, angle_y, angle_uv, skip,
         tx_size, uv_tx, has_chroma, cfl_u, cfl_v, fi, tx_off,
         n_tx) = (int(v) for v in b)
        rec = BlockRecord(
            r=br, c=bc, bsize=bsize, y_mode=y_mode, uv_mode=uv_mode,
            angle_y=angle_y, angle_uv=angle_uv, skip=bool(skip),
            tx_size=tx_size, uv_tx_size=uv_tx,
            has_chroma=bool(has_chroma),
            cfl_alphas=((cfl_u, cfl_v)
                        if uv_mode == C.UV_CFL_PRED else None),
            filter_intra=fi if fi >= 0 else None)
        for k in range(tx_off, tx_off + n_tx):
            (plane, x, y, tsz, ttyp, eob, coff, lossless) = \
                (int(v) for v in txs[k])
            adj = T.ADJUSTED_TX_SIZE[tsz]
            tw, th = T.TX_WIDTH[adj], T.TX_HEIGHT[adj]
            rec.tx_blocks.append(TxBlock(
                plane=plane, x=x, y=y, tx_size=tsz, tx_type=ttyp,
                eob=eob,
                coeffs=coeffs_buf[coff:coff + tw * th]
                .reshape(th, tw).copy(),
                lossless=bool(lossless)))
        plan.blocks.append(rec)
        if uv_mode == C.UV_CFL_PRED:
            plan.cfl_alphas[(br, bc)] = (cfl_u, cfl_v)
        if fi >= 0:
            plan.filter_intra[(br, bc)] = fi
    for lf in bufs["lf"][:out.n_lf]:
        plan.lf_txs.append((int(lf[0]), int(lf[1]), int(lf[2]),
                            int(lf[3])))
    for k, g in bufs["grids"].items():
        getattr(plan, k)[:, :] = g
    cdef_buf = bufs["cdef"]
    for ur in range(cdef_buf.shape[0]):
        for uc in range(cdef_buf.shape[1]):
            if cdef_buf[ur, uc] != -1:
                plan.cdef_idx[(ur * 16, uc * 16)] = int(cdef_buf[ur, uc])
    return True


def _build_rp(seq, hdr):
    cdef = hdr.cdef

    def pad8(v):
        a = (ctypes.c_int32 * 8)()
        for i in range(min(8, len(v))):
            a[i] = v[i]
        return a

    return _ReconParams(
        bitdepth=seq.color.bitdepth, num_planes=seq.color.num_planes,
        ssx=seq.color.subsampling_x, ssy=seq.color.subsampling_y,
        mi_rows=hdr.mi_rows, mi_cols=hdr.mi_cols,
        enable_intra_edge_filter=int(
            getattr(seq, "enable_intra_edge_filter", False)),
        lf_level=(ctypes.c_int32 * 4)(*hdr.lf.level),
        lf_sharpness=hdr.lf.sharpness,
        lf_delta_enabled=int(hdr.lf.delta_enabled),
        lf_ref_delta_intra=hdr.lf.ref_deltas[0],
        enable_cdef=int(getattr(seq, "enable_cdef", False)),
        cdef_damping=cdef.damping if cdef else 3,
        cdef_y_pri=pad8(cdef.y_pri_strength if cdef else []),
        cdef_y_sec=pad8(cdef.y_sec_strength if cdef else []),
        cdef_uv_pri=pad8(cdef.uv_pri_strength if cdef else []),
        cdef_uv_sec=pad8(cdef.uv_sec_strength if cdef else []),
        coded_lossless=int(hdr.coded_lossless),
        allow_intrabc=int(getattr(hdr, "allow_intrabc", False)),
        frame_width=hdr.upscaled_width,
        frame_height=hdr.frame_height,
    )


def export_frame_bridge(seq, hdr, tiles: List[bytes]):
    """C entropy decode + pred-unit export for the device recon
    pipeline: returns dict(units[n,24], txs[n,8], coeffs[...] int32,
    rp) or None when the native path is unavailable/declines.  The
    arrays are copies (safe to hold across frames for pipelining)."""
    lib = _load()
    if lib is None:
        return None
    res = _run_tiles(lib, seq, hdr, tiles)
    if res is None:
        return None
    out, bufs = res
    rp = _build_rp(seq, hdr)
    # one record per plane per visited tx; lf_txs shares geometry for
    # u/v so double it for the worst case
    max_units = int(out.n_lf) * 2 + 64
    units = np.empty((max_units, 24), np.int32)
    n_out = ctypes.c_int64(0)
    rc = lib.av1_export_pred_units(ctypes.byref(rp), ctypes.byref(out),
                                   _vp(units), max_units,
                                   ctypes.byref(n_out))
    if rc != 0:
        return None
    return {
        "units": units[:n_out.value],
        "txs": bufs["txs"][:out.n_txs].copy(),
        "coeffs": bufs["coeffs"][:out.coeffs_used].copy(),
        "rp": rp, "out": out, "bufs": bufs,
    }


def decode_and_recon_native(seq, hdr, tiles: List[bytes]):
    """Full native frame path: tile decode + recon + loop filter + CDEF
    in C.  Returns the cropped output planes (uint8/uint16), or None if
    the native path is unavailable or declines (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    res = _run_tiles(lib, seq, hdr, tiles)
    if res is None:
        return None
    out, bufs = res
    rp = _build_rp(seq, hdr)

    ssx, ssy = seq.color.subsampling_x, seq.color.subsampling_y
    if os.environ.get("EASYAV1_PIPE", "native") == "pallas":
        planes = _pallas_frame(lib, seq, hdr, out, bufs, rp)
        if planes is not None:
            return planes
        # fall through to the C recon when the device path declines

    aw, ah = hdr.mi_cols * 4, hdr.mi_rows * 4
    pkey = ("planes", ah, aw, ssx, ssy)
    pl = _BUF_POOL.get(pkey)
    if pl is None:
        # recon covers every mi-aligned pixel, so no zeroing needed
        pl = (np.empty((ah, aw), np.int32),
              np.empty((ah >> ssy, aw >> ssx), np.int32),
              np.empty((ah >> ssy, aw >> ssx), np.int32))
        _BUF_POOL[pkey] = pl
    py, pu, pv = pl
    device = os.environ.get("EASYAV1_PIPE", "native") == "device"
    if device:
        # dense math only in C; the loop filter and CDEF run as device
        # (JAX) kernels on the mi-aligned planes
        rp.lf_level = (ctypes.c_int32 * 4)(0, 0, 0, 0)
        rp.enable_cdef = 0
    rc = lib.av1_recon_frame(ctypes.byref(rp), ctypes.byref(out),
                             _vp(py), _vp(pu), _vp(pv))
    if rc != 0:
        return None
    n_pl = seq.color.num_planes
    aligned = [py, pu, pv][:n_pl]
    if device:
        _device_postfilter(seq, hdr, out, bufs, aligned, rp)
    w, h = hdr.upscaled_width, hdr.frame_height
    cw, ch = (w + ssx) >> ssx, (h + ssy) >> ssy
    dt = np.uint8 if seq.color.bitdepth == 8 else np.uint16
    planes = [py[:h, :w].astype(dt)]
    if n_pl > 1:
        planes.append(pu[:ch, :cw].astype(dt))
        planes.append(pv[:ch, :cw].astype(dt))
    return planes


_PALLAS_RECONS: dict = {}


class _LazyPlanes:
    """Sequence of decoded planes whose device→host download completes
    on first access.  `copy_to_host_async` is issued at construction,
    so the transfer overlaps the caller's next-frame entropy decode —
    the TPU-pipe analog of the reference's decode-ahead thread
    (easyav1.c:2271-2333) at the frame-data level."""

    __slots__ = ("_devs", "_np")

    def __init__(self, devs):
        self._devs = devs
        self._np = None
        for d in devs:
            d.copy_to_host_async()

    def _mat(self):
        if self._np is None:
            self._np = [np.asarray(d) for d in self._devs]
            self._devs = None
        return self._np

    def __len__(self):
        return len(self._np if self._np is not None else self._devs)

    def __getitem__(self, i):
        return self._mat()[i]

    def __iter__(self):
        return iter(self._mat())


def _pallas_frame(lib, seq, hdr, out, bufs, rp):
    """TPU recon pipe: the C entropy decoder's per-unit export feeds
    the Pallas strip executor (residual compose + intra prediction on
    device); loop filter and CDEF then run as device kernels.  Returns
    visible planes, or None when the frame uses features the device
    executor lacks (inter, lossless, filter-intra) — caller falls back
    to the C recon (entropy work is shared, not redone)."""
    from easyav1_tpu.video.av1.recon.jax_exec import PallasRecon

    max_units = int(out.n_lf) * 2 + 64
    units = np.empty((max_units, 24), np.int32)
    n_out = ctypes.c_int64(0)
    rc = lib.av1_export_pred_units(ctypes.byref(rp), ctypes.byref(out),
                                   _vp(units), max_units,
                                   ctypes.byref(n_out))
    if rc != 0:
        return None
    ssx, ssy = seq.color.subsampling_x, seq.color.subsampling_y
    key = (hdr.mi_rows, hdr.mi_cols, ssx, ssy, seq.color.bitdepth,
           seq.color.num_planes, bool(seq.use_128x128_superblock))
    pr = _PALLAS_RECONS.get(key)
    if pr is None:
        pr = _PALLAS_RECONS[key] = PallasRecon(*key[:6], sb128=key[6])
    outs = pr.run(units[:n_out.value], bufs["txs"][:out.n_txs],
                  bufs["coeffs"][:out.coeffs_used])
    if outs is None:
        return None
    from easyav1_tpu.video.av1.recon.postfilter_fused import \
        postfilter_frame
    import jax.numpy as jnp
    lpad = pr.IP.LPAD
    dev = [outs[p][:ph, lpad:lpad + pw]
           for p, (ph, pw) in enumerate(pr.dims)]
    dev = postfilter_frame(dev, hdr, seq, _grids_exporter(lib, rp, out),
                           bufs["grids"]["skip"], bufs["cdef"])
    w, h = hdr.upscaled_width, hdr.frame_height
    cw, ch = (w + ssx) >> ssx, (h + ssy) >> ssy
    dt = jnp.uint8 if seq.color.bitdepth == 8 else jnp.uint16
    final = [dev[0][:h, :w].astype(dt)]
    if seq.color.num_planes > 1:
        final.append(dev[1][:ch, :cw].astype(dt))
        final.append(dev[2][:ch, :cw].astype(dt))
    return _LazyPlanes(final)


def _grids_exporter(lib, rp, out):
    """grids_for(plane, shape) closure over the C decoder's exported
    per-4x4-cell loop-filter grids."""
    def grids_for(plane, shape):
        h, w = shape
        gw, gh = (w + 3) >> 2, (h + 3) >> 2
        a = [np.empty((gh, gw), np.uint8) for _ in range(5)]
        rc = lib.av1_lf_grids_export(
            ctypes.byref(rp), ctypes.byref(out), plane, w, h,
            _vp(a[0]), _vp(a[1]), _vp(a[2]), _vp(a[3]), _vp(a[4]))
        if rc != 0:
            raise RuntimeError("lf grids export failed")
        return {"txw": a[0].astype(np.int32), "txh": a[1].astype(np.int32),
                "skip": a[2].astype(np.int32),
                "edge_left": a[3].astype(bool),
                "edge_top": a[4].astype(bool), "gw": gw, "gh": gh}
    return grids_for


def _device_postfilter(seq, hdr, out, bufs, aligned, rp):
    """Loop filter + CDEF on device (fused, device-resident) using the
    native decoder's grids; results written back into `aligned`."""
    from easyav1_tpu.video.av1.recon.postfilter_fused import \
        postfilter_frame

    lib = _load()
    dev = postfilter_frame(aligned, hdr, seq, _grids_exporter(lib, rp, out),
                           bufs["grids"]["skip"], bufs["cdef"])
    for p, d in enumerate(dev):
        if d is not aligned[p]:
            aligned[p][:, :] = np.asarray(d)
