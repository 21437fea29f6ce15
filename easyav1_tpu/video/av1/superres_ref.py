"""Superres horizontal upscaling (spec §7.16), bit-exact numpy.

Applied between CDEF and loop restoration: each plane is upscaled
horizontally from its downscaled coded width to its upscaled width
with the normative 64-phase 8-tap filter.  Mirrors the role of
dav1d's resize stage / libaom av1_upscale_normative_rows (the
reference decoder path behind easyav1's dav1d backend).

The filter table is the normative Upscale_Filter of spec §7.16
(extracted from the libaom binary on this host — spec constants, same
provenance as native/av1_tables.h).
"""

from __future__ import annotations

import numpy as np

RS_SCALE_SUBPEL_BITS = 14
RS_SCALE_SUBPEL_MASK = (1 << RS_SCALE_SUBPEL_BITS) - 1
RS_SCALE_EXTRA_BITS = 8          # 14 - 6 (64 filter phases)
RS_SCALE_EXTRA_OFF = 1 << (RS_SCALE_EXTRA_BITS - 1)
FILTER_BITS = 7
UPSCALE_TAPS = 8

UPSCALE_FILTER = np.array((
    (0, 0, 0, 128, 0, 0, 0, 0), (0, 0, -1, 128, 2, -1, 0, 0),
    (0, 1, -3, 127, 4, -2, 1, 0), (0, 1, -4, 127, 6, -3, 1, 0),
    (0, 2, -6, 126, 8, -3, 1, 0), (0, 2, -7, 125, 11, -4, 1, 0),
    (-1, 2, -8, 125, 13, -5, 2, 0), (-1, 3, -9, 124, 15, -6, 2, 0),
    (-1, 3, -10, 123, 18, -6, 2, -1), (-1, 3, -11, 122, 20, -7, 3, -1),
    (-1, 4, -12, 121, 22, -8, 3, -1), (-1, 4, -13, 120, 25, -9, 3, -1),
    (-1, 4, -14, 118, 28, -9, 3, -1), (-1, 4, -15, 117, 30, -10, 4, -1),
    (-1, 5, -16, 116, 32, -11, 4, -1), (-1, 5, -16, 114, 35, -12, 4, -1),
    (-1, 5, -17, 112, 38, -12, 4, -1), (-1, 5, -18, 111, 40, -13, 5, -1),
    (-1, 5, -18, 109, 43, -14, 5, -1), (-1, 6, -19, 107, 45, -14, 5, -1),
    (-1, 6, -19, 105, 48, -15, 5, -1), (-1, 6, -19, 103, 51, -16, 5, -1),
    (-1, 6, -20, 101, 53, -16, 6, -1), (-1, 6, -20, 99, 56, -17, 6, -1),
    (-1, 6, -20, 97, 58, -17, 6, -1), (-1, 6, -20, 95, 61, -18, 6, -1),
    (-2, 7, -20, 93, 64, -18, 6, -2), (-2, 7, -20, 91, 66, -19, 6, -1),
    (-2, 7, -20, 88, 69, -19, 6, -1), (-2, 7, -20, 86, 71, -19, 6, -1),
    (-2, 7, -20, 84, 74, -20, 7, -2), (-2, 7, -20, 81, 76, -20, 7, -1),
    (-2, 7, -20, 79, 79, -20, 7, -2), (-1, 7, -20, 76, 81, -20, 7, -2),
    (-2, 7, -20, 74, 84, -20, 7, -2), (-1, 6, -19, 71, 86, -20, 7, -2),
    (-1, 6, -19, 69, 88, -20, 7, -2), (-1, 6, -19, 66, 91, -20, 7, -2),
    (-2, 6, -18, 64, 93, -20, 7, -2), (-1, 6, -18, 61, 95, -20, 6, -1),
    (-1, 6, -17, 58, 97, -20, 6, -1), (-1, 6, -17, 56, 99, -20, 6, -1),
    (-1, 6, -16, 53, 101, -20, 6, -1), (-1, 5, -16, 51, 103, -19, 6, -1),
    (-1, 5, -15, 48, 105, -19, 6, -1), (-1, 5, -14, 45, 107, -19, 6, -1),
    (-1, 5, -14, 43, 109, -18, 5, -1), (-1, 5, -13, 40, 111, -18, 5, -1),
    (-1, 4, -12, 38, 112, -17, 5, -1), (-1, 4, -12, 35, 114, -16, 5, -1),
    (-1, 4, -11, 32, 116, -16, 5, -1), (-1, 4, -10, 30, 117, -15, 4, -1),
    (-1, 3, -9, 28, 118, -14, 4, -1), (-1, 3, -9, 25, 120, -13, 4, -1),
    (-1, 3, -8, 22, 121, -12, 4, -1), (-1, 3, -7, 20, 122, -11, 3, -1),
    (-1, 2, -6, 18, 123, -10, 3, -1), (0, 2, -6, 15, 124, -9, 3, -1),
    (0, 2, -5, 13, 125, -8, 2, -1), (0, 1, -4, 11, 125, -7, 2, 0),
    (0, 1, -3, 8, 126, -6, 2, 0), (0, 1, -3, 6, 127, -4, 1, 0),
    (0, 1, -2, 4, 127, -3, 1, 0), (0, 0, -1, 2, 128, -1, 0, 0),
), np.int32)


def _trunc_div(a: int, b: int) -> int:
    """C-style integer division (truncates toward zero)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def upscale_row_params(src_w: int, dst_w: int):
    """(x_step_qn, x0_qn) per spec §7.16 / libaom
    av1_get_upscale_convolve_step + get_upscale_convolve_x0."""
    x_step = _trunc_div((src_w << RS_SCALE_SUBPEL_BITS) + dst_w // 2,
                        dst_w)
    err = x_step * dst_w - (src_w << RS_SCALE_SUBPEL_BITS)
    x0 = (_trunc_div(
        -((dst_w - src_w) << (RS_SCALE_SUBPEL_BITS - 1)) + dst_w // 2,
        dst_w) + RS_SCALE_EXTRA_OFF - _trunc_div(err, 2)) \
        & RS_SCALE_SUBPEL_MASK
    return x_step, x0


def upscale_plane(src: np.ndarray, src_w: int, dst_w: int,
                  bd: int) -> np.ndarray:
    """Horizontally upscale [h, >=src_w] -> [h, dst_w] (normative).

    `src` is the mi-aligned decoded plane: taps past the visible
    downscaled width src_w read the real decoded mi-area pixels, and
    only past the ALIGNED edge do they replicate (verified vs dav1d —
    clamping at src_w-1 is off by one near the right edge whenever the
    mi area extends beyond the visible width)."""
    h, aw = src.shape
    x_step, x0 = upscale_row_params(src_w, dst_w)
    # spec srcX carries a -(1 << SUPERRES_SCALE_BITS) bias
    x_qn = (x0 - (1 << RS_SCALE_SUBPEL_BITS)
            + np.arange(dst_w, dtype=np.int64) * x_step)
    base = (x_qn >> RS_SCALE_SUBPEL_BITS) - (UPSCALE_TAPS // 2 - 1)
    idx = np.clip(base[:, None] + np.arange(UPSCALE_TAPS)[None, :],
                  0, aw - 1)                          # [dst_w, 8]
    fil = UPSCALE_FILTER[(x_qn & RS_SCALE_SUBPEL_MASK)
                         >> RS_SCALE_EXTRA_BITS]      # [dst_w, 8]
    acc = np.einsum("hwk,wk->hw", src.astype(np.int64)[:, idx], fil)
    out = (acc + (1 << (FILTER_BITS - 1))) >> FILTER_BITS
    return np.clip(out, 0, (1 << bd) - 1).astype(src.dtype)


def superres_upscale(planes, hdr, seq):
    """Upscale all planes of a use_superres frame (between CDEF and
    loop restoration).  Input planes are mi-aligned at the downscaled
    width; outputs have the upscaled plane widths (rows preserved)."""
    ssx = seq.color.subsampling_x
    bd = seq.color.bitdepth
    out = []
    for p, plane in enumerate(planes):
        sx = ssx if p else 0
        src_w = (hdr.frame_width + sx) >> sx
        dst_w = (hdr.upscaled_width + sx) >> sx
        out.append(upscale_plane(plane, src_w, dst_w, bd))
    return out
