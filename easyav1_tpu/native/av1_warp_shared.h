/* Warp math shared by the tile decoder (parameter estimation,
 * av1_inter.h) and the reconstruction side (gm shear + affine warp,
 * av1_mc.h).  Port of warp.py; dav1d warpmv.c role. */
#pragma once

#include <stdint.h>

#define WM_PREC_BITS 16
#define WARP_PARAM_REDUCE_BITS 6
#define DIV_LUT_PREC_BITS 8
#define DIV_LUT_BITS 14

static int ws_log2(uint32_t x) {
    int n = -1;
    while (x) { n++; x >>= 1; }
    return n;
}

/* |d| -> (1/d in Q-lut, shift); d > 0.  64-bit: the affine LS
 * determinant routinely exceeds 32 bits (warp.py works in Python
 * bigints). */
static void resolve_divisor64(int64_t d, int *idet, int *shift) {
    int s = -1;
    for (uint64_t v = (uint64_t)d; v; v >>= 1) s++;
    int64_t e = d - ((int64_t)1 << s);
    int64_t f;
    if (s > DIV_LUT_PREC_BITS)
        f = (e + ((int64_t)1 << (s - DIV_LUT_PREC_BITS - 1)))
            >> (s - DIV_LUT_PREC_BITS);
    else
        f = e << (DIV_LUT_PREC_BITS - s);
    *idet = av1_div_lut[f];
    *shift = s + DIV_LUT_BITS;
}

static void resolve_divisor(int d, int *idet, int *shift) {
    resolve_divisor64(d, idet, shift);
}

static int64_t apply_sign64(int64_t v, int64_t s) {
    return s < 0 ? -v : v;
}

static int64_t round2_signed64(int64_t v, int n) {
    int64_t a = v < 0 ? -v : v;
    int64_t r = (a + ((int64_t)1 << (n - 1))) >> n;
    return v < 0 ? -r : r;
}

static int ws_iclip(int64_t v, int64_t lo, int64_t hi) {
    return (int)(v < lo ? lo : (v > hi ? hi : v));
}

/* warp.py get_shear_params -> (alpha, beta, gamma, delta) in sh[4];
 * returns 0 when the warp is shear-invalid (translational fallback) */
static int get_shear_params(const int32_t *mat, int32_t *sh) {
    if (mat[2] <= 0) return 0;
    int alpha = ws_iclip(mat[2] - (1 << 16), -32768, 32767);
    int beta = ws_iclip(mat[3], -32768, 32767);
    int idet, shift;
    resolve_divisor(mat[2], &idet, &shift);
    shift -= WM_PREC_BITS;
    int64_t v = (int64_t)mat[4] * (1 << WM_PREC_BITS) * idet;
    int gamma = ws_iclip(round2_signed64(v, shift + WM_PREC_BITS),
                         -32768, 32767);
    int64_t w = (int64_t)mat[3] * mat[4] * idet;
    int delta = ws_iclip((int64_t)mat[5]
                         - round2_signed64(w, shift + WM_PREC_BITS)
                         - (1 << 16), -32768, 32767);

#define REDUCE_WM(x) \
    ((int)apply_sign64((((x) < 0 ? -(x) : (x)) \
                        + (1 << (WARP_PARAM_REDUCE_BITS - 1))) \
                           >> WARP_PARAM_REDUCE_BITS, \
                       (x)) * (1 << WARP_PARAM_REDUCE_BITS))
    alpha = REDUCE_WM(alpha);
    beta = REDUCE_WM(beta);
    gamma = REDUCE_WM(gamma);
    delta = REDUCE_WM(delta);
#undef REDUCE_WM

    int aa = alpha < 0 ? -alpha : alpha;
    int ab = beta < 0 ? -beta : beta;
    int ag = gamma < 0 ? -gamma : gamma;
    int ad = delta < 0 ? -delta : delta;
    if (4 * aa + 7 * ab >= (1 << 16)) return 0;
    if (4 * ag + 4 * ad >= (1 << 16)) return 0;
    sh[0] = alpha; sh[1] = beta; sh[2] = gamma; sh[3] = delta;
    return 1;
}
