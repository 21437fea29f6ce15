"""AV1 warped motion: local-warp parameter estimation (spec §7.11.3.8),
shear setup/validation (§7.11.3.6-7) and the affine warp filter
(§7.11.3.5).

Integer semantics recovered from the system libdav1d disassembly
(dav1d_find_affine_int / dav1d_get_shear_params) and verified bit-exact
against dav1d end-to-end; the Warp_Filter coefficient table and Div_Lut
come from libaom .rodata (tools/extract_warp_tables.py).  Reference
parity target: easyav1 delegates all AV1 decode to dav1d
(`src/easyav1.c` via dav1d_send_data/get_picture); this module is part
of our from-scratch replacement for that decoder.

Host-side numpy reference; the batched device path lives in recon/.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from . import tables as T

WARPEDMODEL_PREC_BITS = 16
WARP_PARAM_REDUCE_BITS = 6
DIV_LUT_PREC_BITS = 8
DIV_LUT_BITS = 14
LS_MV_MAX = 256


def _div_lut():
    return T.data()["div_lut"].astype(np.int64)


def _warp_filter():
    return T.data()["warped_filter"].astype(np.int64)


def _iclip(v: int, lo: int, hi: int) -> int:
    return lo if v < lo else hi if v > hi else v


def _apply_sign(v: int, s: int) -> int:
    return -v if s < 0 else v


def _resolve_divisor(d: int) -> Tuple[int, int]:
    """|d| -> (1/d in Q14-ish, shift).  d > 0."""
    shift = d.bit_length() - 1
    e = d - (1 << shift)
    if shift > DIV_LUT_PREC_BITS:
        f = (e + (1 << (shift - DIV_LUT_PREC_BITS - 1))) \
            >> (shift - DIV_LUT_PREC_BITS)
    else:
        f = e << (DIV_LUT_PREC_BITS - shift)
    return int(_div_lut()[f]), shift + DIV_LUT_BITS


def find_affine_int(cands: List[Tuple[int, int, int, int]],
                    mi_r: int, mi_c: int, bsize: int,
                    mv: Tuple[int, int]) -> Optional[list]:
    """Least-squares affine fit over warp samples.

    cands: [(sx8, sy8, dx8, dy8)] source/dest positions in 1/8-pel
    (CandList); mv: this block's (row, col) mv in 1/8-pel.
    Returns wmmat [tx, ty, m2, m3, m4, m5] or None if degenerate.
    """
    from . import constants as C
    w4 = C.BLOCK_W4[bsize]
    h4 = C.BLOCK_H4[bsize]
    mid_x = mi_c * 4 + w4 * 2 - 1
    mid_y = mi_r * 4 + h4 * 2 - 1
    su_x = mid_x * 8
    su_y = mid_y * 8
    du_x = su_x + mv[1]
    du_y = su_y + mv[0]

    a00 = a01 = a11 = 0
    bx0 = bx1 = by0 = by1 = 0
    for (cx, cy, cdx, cdy) in cands:
        sx = cx - su_x
        sy = cy - su_y
        dx = cdx - du_x
        dy = cdy - du_y
        if abs(sx - dx) >= LS_MV_MAX or abs(sy - dy) >= LS_MV_MAX:
            continue
        # LS accumulators (dav1d find_affine_int, exact)
        a00 += ((sx * sx) >> 2) + 2 * sx + 8
        a01 += ((sy * sx) >> 2) + sx + sy + 4
        a11 += ((sy * sy) >> 2) + 2 * sy + 8
        bx0 += ((sx * dx) >> 2) + sx + dx + 8
        bx1 += ((sy * dx) >> 2) + sy + dx + 4
        by0 += ((sx * dy) >> 2) + sx + dy + 4
        by1 += ((sy * dy) >> 2) + sy + dy + 8

    det = a00 * a11 - a01 * a01
    if det == 0:
        return None
    idet, shift = _resolve_divisor(abs(det))
    idet = _apply_sign(idet, det)
    shift -= WARPEDMODEL_PREC_BITS
    if shift < 0:
        idet <<= -shift
        shift = 0

    def rnd(v: int) -> int:
        v *= idet
        if shift == 0:
            return v
        return _apply_sign((abs(v) + (1 << (shift - 1))) >> shift, v)

    diag_lo = (1 << WARPEDMODEL_PREC_BITS) - (1 << 13) + 1
    diag_hi = (1 << WARPEDMODEL_PREC_BITS) + (1 << 13) - 1
    nd = (1 << 13) - 1
    m2 = _iclip(rnd(a11 * bx0 - a01 * bx1), diag_lo, diag_hi)
    m3 = _iclip(rnd(a00 * bx1 - a01 * bx0), -nd, nd)
    m4 = _iclip(rnd(a11 * by0 - a01 * by1), -nd, nd)
    m5 = _iclip(rnd(a00 * by1 - a01 * by0), diag_lo, diag_hi)

    tclamp = (1 << 23) - 1
    tx = _iclip((mv[1] << 13)
                - (mid_x * (m2 - (1 << 16)) + mid_y * m3), -tclamp, tclamp)
    ty = _iclip((mv[0] << 13)
                - (mid_x * m4 + mid_y * (m5 - (1 << 16))), -tclamp, tclamp)
    return [tx, ty, m2, m3, m4, m5]


def get_shear_params(mat: list) -> Optional[Tuple[int, int, int, int]]:
    """-> (alpha, beta, gamma, delta) or None if the warp is invalid
    (spec setup_shear; dav1d_get_shear_params exact)."""
    if mat[2] <= 0:
        return None
    alpha = _iclip(mat[2] - (1 << 16), -32768, 32767)
    beta = _iclip(mat[3], -32768, 32767)
    idet, shift = _resolve_divisor(mat[2])
    shift -= WARPEDMODEL_PREC_BITS
    v = (mat[4] << WARPEDMODEL_PREC_BITS) * idet
    gamma = _iclip(_round2_signed(v, shift + WARPEDMODEL_PREC_BITS),
                   -32768, 32767)
    w = (mat[3] * mat[4]) * idet
    delta = _iclip(mat[5] - _round2_signed(w, shift + WARPEDMODEL_PREC_BITS)
                   - (1 << 16), -32768, 32767)

    def reduce(v: int) -> int:
        return _apply_sign(
            (abs(v) + (1 << (WARP_PARAM_REDUCE_BITS - 1)))
            >> WARP_PARAM_REDUCE_BITS, v) * (1 << WARP_PARAM_REDUCE_BITS)

    alpha = reduce(alpha)
    beta = reduce(beta)
    gamma = reduce(gamma)
    delta = reduce(delta)
    if 4 * abs(alpha) + 7 * abs(beta) >= (1 << 16):
        return None
    if 4 * abs(gamma) + 4 * abs(delta) >= (1 << 16):
        return None
    return alpha, beta, gamma, delta


def _round2_signed(v: int, s: int) -> int:
    return _apply_sign((abs(v) + (1 << (s - 1))) >> s, v)


def warp_affine(ref: np.ndarray, mat: list, shear: Tuple[int, int, int, int],
                x: int, y: int, w: int, h: int, ssx: int, ssy: int,
                bd: int) -> np.ndarray:
    """Affine warp prediction (spec §7.11.3.5 block warp process).

    ref: full reference plane; (x, y, w, h): output rect in PLANE
    coords; returns (h, w) uint16 prediction.  Python reference --
    readability over speed (the device path batches this).
    """
    alpha, beta, gamma, delta = shear
    wf = _warp_filter()
    last_x = ref.shape[1] - 1
    last_y = ref.shape[0] - 1
    out = np.zeros((h, w), np.int64)
    refi = ref.astype(np.int64)
    for i in range(0, h, 8):
        for j in range(0, w, 8):
            # center of the 8x8 dst subblock, in luma units
            src_x = (x + j + 4) << ssx
            src_y = (y + i + 4) << ssy
            dst_x = mat[2] * src_x + mat[3] * src_y + mat[0]
            dst_y = mat[4] * src_x + mat[5] * src_y + mat[1]
            x4 = dst_x >> ssx
            y4 = dst_y >> ssy
            ix4 = x4 >> WARPEDMODEL_PREC_BITS
            sx4 = x4 & ((1 << WARPEDMODEL_PREC_BITS) - 1)
            iy4 = y4 >> WARPEDMODEL_PREC_BITS
            sy4 = y4 & ((1 << WARPEDMODEL_PREC_BITS) - 1)
            sx4 += alpha * (-4) + beta * (-4)
            sy4 += gamma * (-4) + delta * (-4)
            sx4 &= ~((1 << WARP_PARAM_REDUCE_BITS) - 1)
            sy4 &= ~((1 << WARP_PARAM_REDUCE_BITS) - 1)

            # horizontal pass -> 15x8 intermediate
            tmp = np.zeros((15, 8), np.int64)
            for k in range(-7, 8):
                iy = _iclip(iy4 + k, 0, last_y)
                sx = sx4 + beta * (k + 4)
                for l in range(-4, 4):
                    offs = ((sx + 512) >> 10) + 64
                    coeffs = wf[offs]
                    s = 0
                    for m in range(8):
                        sample_x = _iclip(ix4 + m + l - 3, 0, last_x)
                        s += refi[iy, sample_x] * coeffs[m]
                    tmp[k + 7, l + 4] = (s + 4) >> 3        # InterRound0=3
                    sx += alpha
            # vertical pass
            for k in range(-4, 4):
                if i + k + 4 >= h:
                    break
                sy = sy4 + delta * (k + 4)
                for l in range(-4, 4):
                    if j + l + 4 >= w:
                        sy += gamma
                        continue
                    offs = ((sy + 512) >> 10) + 64
                    coeffs = wf[offs]
                    s = 0
                    for m in range(8):
                        s += tmp[k + m + 4, l + 4] * coeffs[m]
                    out[i + k + 4, j + l + 4] = (s + 1024) >> 11  # Round1
                    sy += gamma
    return np.clip(out, 0, (1 << bd) - 1)
