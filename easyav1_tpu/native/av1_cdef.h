/* AV1 CDEF, C port of cdef_ref.py (spec §7.15).
 * Header-only; included by av1_recon.c after the Recon definitions. */
#pragma once

#include <stdint.h>
#include <stdlib.h>

#define CDEF_VERY_LARGE 0x4000

static const int8_t CDEF_DIRS[8][2][2] = {
    {{-1, 1}, {-2, 2}}, {{0, 1}, {-1, 2}}, {{0, 1}, {0, 2}},
    {{0, 1}, {1, 2}},   {{1, 1}, {2, 2}},  {{1, 0}, {2, 1}},
    {{1, 0}, {2, 0}},   {{1, 0}, {2, -1}}};

static const int16_t CDEF_DIV[9] = {0, 840, 420, 280, 210, 168, 140, 120,
                                    105};

/* chroma direction conversion (spec Cdef_Uv_Dir[ss_x][ss_y][dir]) */
static const int8_t CDEF_UV_DIR[2][2][8] = {
    {{0, 1, 2, 3, 4, 5, 6, 7}, {1, 2, 2, 2, 3, 4, 6, 0}},
    {{7, 0, 2, 4, 5, 6, 6, 6}, {0, 1, 2, 3, 4, 5, 6, 7}}};

static void cdef_find_dir(const int32_t *src, int stride, int coeff_shift,
                          int *out_dir, int *out_var) {
    int64_t partial[8][15];
    memset(partial, 0, sizeof(partial));
    for (int i = 0; i < 8; i++)
        for (int j = 0; j < 8; j++) {
            int x = (src[i * stride + j] >> coeff_shift) - 128;
            partial[0][i + j] += x;
            partial[1][i + (j >> 1)] += x;
            partial[2][i] += x;
            partial[3][3 + i - (j >> 1)] += x;
            partial[4][7 + i - j] += x;
            partial[5][3 - (i >> 1) + j] += x;
            partial[6][j] += x;
            partial[7][(i >> 1) + j] += x;
        }
    int64_t cost[8];
    memset(cost, 0, sizeof(cost));
    for (int i = 0; i < 8; i++) {
        cost[2] += partial[2][i] * partial[2][i];
        cost[6] += partial[6][i] * partial[6][i];
    }
    cost[2] *= 105;
    cost[6] *= 105;
    for (int d = 0; d < 8; d += 4) {
        for (int i = 0; i < 7; i++) {
            cost[d] += partial[d][i] * partial[d][i] * CDEF_DIV[i + 1];
            cost[d] += partial[d][14 - i] * partial[d][14 - i]
                       * CDEF_DIV[i + 1];
        }
        cost[d] += partial[d][7] * partial[d][7] * 105;
    }
    for (int d = 1; d < 8; d += 2) {
        for (int i = 0; i < 5; i++)
            cost[d] += partial[d][3 + i] * partial[d][3 + i];
        cost[d] *= 105;
        for (int i = 0; i < 3; i++)
            cost[d] += (partial[d][i] * partial[d][i]
                        + partial[d][10 - i] * partial[d][10 - i])
                       * CDEF_DIV[2 * i + 2];
    }
    int best = 0;
    for (int d = 1; d < 8; d++)
        if (cost[d] > cost[best]) best = d;
    *out_dir = best;
    *out_var = (int)((cost[best] - cost[(best + 4) & 7]) >> 10);
}

/* constrain with the damping shift precomputed per strength */
static inline int cdef_constr(int diff, int threshold, int shift) {
    int ad = diff < 0 ? -diff : diff;
    int rhs = threshold - (ad >> shift);
    if (rhs < 0) rhs = 0;
    int mag = ad < rhs ? ad : rhs;
    return diff < 0 ? -mag : mag;
}

static int cdef_shift_for(int threshold, int damping) {
    if (!threshold) return 0;
    int bl = 0;
    for (int v = threshold; v; v >>= 1) bl++;
    int shift = damping - (bl - 1);
    return shift < 0 ? 0 : shift;
}

#ifdef __AVX2__
#include <immintrin.h>

/* vectorized inner loop: one row of 8 (luma) or 4 (chroma) pixels per
   vector; taps/weights/thresholds are block constants */
static void cdef_filter_rows_avx2(int32_t *dst, int dstride,
                                  const int32_t *src, int sstride,
                                  int x, int y, int w, int h,
                                  int n_taps, const int64_t *toff,
                                  const int *tw_, const int *tthr,
                                  const int *tsh) {
    __m256i vlarge = _mm256_set1_epi32(CDEF_VERY_LARGE);
    __m256i zero = _mm256_setzero_si256();
    __m256i eight = _mm256_set1_epi32(8);
    for (int i = 0; i < h; i++) {
        const int32_t *row = src + (int64_t)(y + i + 2) * sstride + x + 2;
        if (w == 8) {
            __m256i px = _mm256_loadu_si256((const __m256i *)row);
            __m256i s = zero, mx = px, mn = px;
            for (int k = 0; k < n_taps; k++) {
                __m256i v = _mm256_loadu_si256(
                    (const __m256i *)(row + toff[k]));
                __m256i diff = _mm256_sub_epi32(v, px);
                __m256i ad = _mm256_abs_epi32(diff);
                __m256i rhs = _mm256_sub_epi32(
                    _mm256_set1_epi32(tthr[k]),
                    _mm256_srl_epi32(ad, _mm_cvtsi32_si128(tsh[k])));
                rhs = _mm256_max_epi32(rhs, zero);
                __m256i mag = _mm256_min_epi32(ad, rhs);
                __m256i m = _mm256_srai_epi32(diff, 31);
                __m256i con = _mm256_sub_epi32(
                    _mm256_xor_si256(mag, m), m);
                s = _mm256_add_epi32(
                    s, _mm256_mullo_epi32(_mm256_set1_epi32(tw_[k]), con));
                __m256i seen = _mm256_xor_si256(
                    _mm256_cmpeq_epi32(v, vlarge), _mm256_set1_epi32(-1));
                mx = _mm256_blendv_epi8(mx, _mm256_max_epi32(mx, v), seen);
                mn = _mm256_blendv_epi8(mn, _mm256_min_epi32(mn, v), seen);
            }
            /* val = px + ((8 + s - (s<0)) >> 4) */
            __m256i adj = _mm256_add_epi32(
                _mm256_add_epi32(eight, s), _mm256_srai_epi32(s, 31));
            __m256i val = _mm256_add_epi32(px, _mm256_srai_epi32(adj, 4));
            val = _mm256_min_epi32(_mm256_max_epi32(val, mn), mx);
            _mm256_storeu_si256(
                (__m256i *)(dst + (int64_t)(y + i) * dstride + x), val);
        } else {   /* w == 4 */
            __m128i px = _mm_loadu_si128((const __m128i *)row);
            __m128i s = _mm_setzero_si128(), mx = px, mn = px;
            for (int k = 0; k < n_taps; k++) {
                __m128i v = _mm_loadu_si128(
                    (const __m128i *)(row + toff[k]));
                __m128i diff = _mm_sub_epi32(v, px);
                __m128i ad = _mm_abs_epi32(diff);
                __m128i rhs = _mm_sub_epi32(
                    _mm_set1_epi32(tthr[k]),
                    _mm_srl_epi32(ad, _mm_cvtsi32_si128(tsh[k])));
                rhs = _mm_max_epi32(rhs, _mm_setzero_si128());
                __m128i mag = _mm_min_epi32(ad, rhs);
                __m128i m = _mm_srai_epi32(diff, 31);
                __m128i con = _mm_sub_epi32(_mm_xor_si128(mag, m), m);
                s = _mm_add_epi32(
                    s, _mm_mullo_epi32(_mm_set1_epi32(tw_[k]), con));
                __m128i seen = _mm_xor_si128(
                    _mm_cmpeq_epi32(v, _mm_set1_epi32(CDEF_VERY_LARGE)),
                    _mm_set1_epi32(-1));
                mx = _mm_blendv_epi8(mx, _mm_max_epi32(mx, v), seen);
                mn = _mm_blendv_epi8(mn, _mm_min_epi32(mn, v), seen);
            }
            __m128i adj = _mm_add_epi32(
                _mm_add_epi32(_mm_set1_epi32(8), s), _mm_srai_epi32(s, 31));
            __m128i val = _mm_add_epi32(px, _mm_srai_epi32(adj, 4));
            val = _mm_min_epi32(_mm_max_epi32(val, mn), mx);
            _mm_storeu_si128(
                (__m128i *)(dst + (int64_t)(y + i) * dstride + x), val);
        }
    }
}
#endif

static void cdef_filter_block(int32_t *dst, int dstride,
                              const int32_t *src, int sstride,
                              int x, int y, int w, int h, int pri, int sec,
                              int damping, int dir, int bd) {
    int pt[2];
    if (((pri >> (bd - 8)) & 1) == 0) { pt[0] = 4; pt[1] = 2; }
    else { pt[0] = 3; pt[1] = 3; }
    static const int st[2] = {2, 1};
    int pri_shift = cdef_shift_for(pri, damping);
    int sec_shift = cdef_shift_for(sec, damping);
    /* precompute the up-to-12 tap offsets (in padded-src units) and
       their weights/thresholds/shifts once per block */
    int n_taps = 0;
    int64_t toff[12];
    int tw_[12], tthr[12], tsh[12];
    if (pri) {
        const int8_t (*d0)[2] = CDEF_DIRS[dir];
        for (int k = 0; k < 2; k++)
            for (int sgn = 1; sgn >= -1; sgn -= 2) {
                toff[n_taps] = (int64_t)sgn * d0[k][0] * sstride
                               + sgn * d0[k][1];
                tw_[n_taps] = pt[k];
                tthr[n_taps] = pri;
                tsh[n_taps] = pri_shift;
                n_taps++;
            }
    }
    if (sec) {
        const int8_t (*s1)[2] = CDEF_DIRS[(dir + 2) & 7];
        const int8_t (*s2)[2] = CDEF_DIRS[(dir + 6) & 7];
        const int8_t (*dirs[2])[2] = {s1, s2};
        for (int di = 0; di < 2; di++)
            for (int k = 0; k < 2; k++)
                for (int sgn = 1; sgn >= -1; sgn -= 2) {
                    toff[n_taps] = (int64_t)sgn * dirs[di][k][0] * sstride
                                   + sgn * dirs[di][k][1];
                    tw_[n_taps] = st[k];
                    tthr[n_taps] = sec;
                    tsh[n_taps] = sec_shift;
                    n_taps++;
                }
    }
#ifdef __AVX2__
    if (w == 8 || w == 4) {
        cdef_filter_rows_avx2(dst, dstride, src, sstride, x, y, w, h,
                              n_taps, toff, tw_, tthr, tsh);
        return;
    }
#endif
    int32_t out[8 * 8];
    for (int i = 0; i < h; i++) {
        const int32_t *row = src + (int64_t)(y + i + 2) * sstride + x + 2;
        for (int j = 0; j < w; j++) {
            int px = row[j];
            int s = 0, mx = px, mn = px;
            for (int k = 0; k < n_taps; k++) {
                int v = row[j + toff[k]];
                s += tw_[k] * cdef_constr(v - px, tthr[k], tsh[k]);
                if (v != CDEF_VERY_LARGE) {
                    if (v > mx) mx = v;
                    if (v < mn) mn = v;
                }
            }
            int val = px + ((8 + s - (s < 0 ? 1 : 0)) >> 4);
            if (val < mn) val = mn;
            if (val > mx) val = mx;
            out[i * w + j] = val;
        }
    }
    for (int i = 0; i < h; i++)
        for (int j = 0; j < w; j++)
            dst[(y + i) * dstride + (x + j)] = out[i * w + j];
}

static void av1_cdef(const ReconParams *rp, const TileOut *o,
                     int32_t *planes[3], const int pw[3], const int ph[3]) {
    if (!rp->enable_cdef) return;
    if (rp->coded_lossless || rp->allow_intrabc) return;
    int any = 0;
    for (int i = 0; i < 8; i++)
        any |= rp->cdef_y_pri[i] | rp->cdef_y_sec[i]
               | rp->cdef_uv_pri[i] | rp->cdef_uv_sec[i];
    if (!any) return;

    int bd = rp->bitdepth;
    int coeff_shift = bd - 8;
    int damping = rp->cdef_damping + coeff_shift;
    int mi_rows = rp->mi_rows, mi_cols = rp->mi_cols;
    int ucols = (mi_cols + 15) / 16;

    /* constant padded sources per plane */
    int32_t *srcs[3] = {NULL, NULL, NULL};
    for (int p = 0; p < rp->num_planes; p++) {
        int sw = pw[p] + 4, sh = ph[p] + 4;
        srcs[p] = malloc(sizeof(int32_t) * (size_t)sw * sh);
        if (!srcs[p]) {
            for (int q = 0; q < p; q++) free(srcs[q]);
            return;
        }
        /* VERY_LARGE border only; the interior is copied over */
        for (int i = 0; i < 2; i++)
            for (int j = 0; j < sw; j++) {
                srcs[p][i * sw + j] = CDEF_VERY_LARGE;
                srcs[p][(sh - 1 - i) * sw + j] = CDEF_VERY_LARGE;
            }
        for (int i = 2; i < sh - 2; i++) {
            srcs[p][i * sw] = CDEF_VERY_LARGE;
            srcs[p][i * sw + 1] = CDEF_VERY_LARGE;
            srcs[p][i * sw + sw - 2] = CDEF_VERY_LARGE;
            srcs[p][i * sw + sw - 1] = CDEF_VERY_LARGE;
            memcpy(srcs[p] + i * sw + 2, planes[p] + (i - 2) * pw[p],
                   (size_t)pw[p] * sizeof(int32_t));
        }
    }

    const int8_t *skip = o->skip;
    for (int r = 0; r < mi_rows; r += 2)
        for (int c = 0; c < mi_cols; c += 2) {
            int r2 = r + 1 < mi_rows ? r + 1 : mi_rows - 1;
            int c2 = c + 1 < mi_cols ? c + 1 : mi_cols - 1;
            if (skip[r * mi_cols + c] && skip[r * mi_cols + c2]
                && skip[r2 * mi_cols + c] && skip[r2 * mi_cols + c2])
                continue;
            int idx = o->cdef_idx[(r / 16) * ucols + (c / 16)];
            if (idx == -1) continue;
            int y = r * 4, x = c * 4;
            int dir = 0, var = 0;
            if (rp->cdef_y_pri[idx] || rp->cdef_uv_pri[idx])
                cdef_find_dir(srcs[0] + (y + 2) * (pw[0] + 4) + (x + 2),
                              pw[0] + 4, coeff_shift, &dir, &var);
            for (int plane = 0; plane < rp->num_planes; plane++) {
                int pri, sec, pdamp, px, py2, w, h, pdir;
                if (plane == 0) {
                    pri = rp->cdef_y_pri[idx] << coeff_shift;
                    sec = rp->cdef_y_sec[idx] << coeff_shift;
                    pdamp = damping;
                    px = x; py2 = y; w = 8; h = 8;
                    pdir = pri ? dir : 0;
                } else {
                    pri = rp->cdef_uv_pri[idx] << coeff_shift;
                    sec = rp->cdef_uv_sec[idx] << coeff_shift;
                    pdamp = damping - 1;
                    px = x >> rp->ssx;
                    py2 = y >> rp->ssy;
                    w = 8 >> rp->ssx;
                    h = 8 >> rp->ssy;
                    pdir = pri ? CDEF_UV_DIR[rp->ssx][rp->ssy][dir] : 0;
                }
                if (pri == 0 && sec == 0) continue;
                int adj_pri = pri;
                if (plane == 0 && pri) {
                    if (var) {
                        int v6 = var >> 6;
                        int i = 0;
                        if (v6) {
                            int bl = 0;
                            for (int t = v6; t; t >>= 1) bl++;
                            i = bl - 1 < 12 ? bl - 1 : 12;
                        }
                        adj_pri = (pri * (4 + i) + 8) >> 4;
                    } else {
                        adj_pri = 0;
                    }
                }
                cdef_filter_block(planes[plane], pw[plane], srcs[plane],
                                  pw[plane] + 4, px, py2, w, h, adj_pri,
                                  sec, pdamp, pdir, bd);
            }
        }
    for (int p = 0; p < rp->num_planes; p++) free(srcs[p]);
}
