/* AV1 CDEF, C port of cdef_ref.py (spec §7.15).
 * Header-only; included by av1_recon.c after the Recon definitions.
 *
 * The padded source planes are int16 (pixels <= 4095 and the padding
 * sentinel 0x4000 both fit), which doubles SIMD lane count versus the
 * int32 frame planes; the filter processes two rows per vector. */
#pragma once

#include <stdint.h>
#include <stdlib.h>

#define CDEF_VERY_LARGE 0x4000
#define CDEF_TSTRIDE 16

/* profiling counters: [0] luma blocks filtered, [1] chroma blocks,
   [2] pri!=0 calls, [3] sec!=0 calls, [4] positions past skip check */
#if PEL_BITS == 16
int64_t cdef_stat[24];
/* per-call rdtsc timing costs ~40ms/60 frames at 1080p when hot
   (2.9M rdtsc pairs); off unless the profiler turns it on */
int cdef_profile;
void cdef_set_profile(int on) { cdef_profile = on; }
void cdef_get_stats(int64_t *out) {
    for (int i = 0; i < 24; i++) { out[i] = cdef_stat[i]; cdef_stat[i] = 0; }
}
#else
extern int64_t cdef_stat[24];
extern int cdef_profile;
#endif

static const int8_t CDEF_DIRS[8][2][2] = {
    {{-1, 1}, {-2, 2}}, {{0, 1}, {-1, 2}}, {{0, 1}, {0, 2}},
    {{0, 1}, {1, 2}},   {{1, 1}, {2, 2}},  {{1, 0}, {2, 1}},
    {{1, 0}, {2, 0}},   {{1, 0}, {2, -1}}};

static const int16_t CDEF_DIV[9] = {0, 840, 420, 280, 210, 168, 140, 120,
                                    105};

#if PEL_BITS == 8
/* unaligned 4-byte store without strict-alignment UB */
static inline void cdef_st32(void *p, int v) {
    memcpy(p, &v, 4);
}
#endif

/* pel row -> int16 stripe row: bit-identical memcpy for 16-bit pel
   (values < 0x4000), widening copy for 8-bit pel */
static inline void cdef_pel_to_i16(int16_t *dst, const pel *src, int n) {
#if PEL_BITS == 16
    memcpy(dst, src, sizeof(int16_t) * (size_t)n);
#else
    for (int i = 0; i < n; i++)
        dst[i] = src[i];
#endif
}

/* chroma direction conversion (spec Cdef_Uv_Dir[ss_x][ss_y][dir]) */
static const int8_t CDEF_UV_DIR[2][2][8] = {
    {{0, 1, 2, 3, 4, 5, 6, 7}, {1, 2, 2, 2, 3, 4, 6, 0}},
    {{7, 0, 2, 4, 5, 6, 6, 6}, {0, 1, 2, 3, 4, 5, 6, 7}}};

#ifdef __AVX2__
#include <immintrin.h>
#endif

#if defined(__AVX512BW__) && defined(__AVX512VL__)
/* Direction search for TWO horizontally adjacent 8x8 blocks (B at
 * src+8) in one pass: zmm lanes 0-15 accumulate block A's projection
 * bins, lanes 16-31 block B's, so every row placement is one
 * maskz_permutexvar_epi16 for both blocks (88 cyc/block vs 124
 * single).  Bit-exact vs the scalar search (see cdef_find_dir). */
static void cdef_find_dir_pair(const pel *src, int stride,
                               int coeff_shift, int *dirA, int *varA,
                               int *dirB, int *varB) {
    const __m256i c128y = _mm256_set1_epi16(128);
    const __m512i lane32 = _mm512_set_epi16(
        31, 30, 29, 28, 27, 26, 25, 24, 23, 22, 21, 20, 19, 18, 17, 16,
        15, 14, 13, 12, 11, 10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0);
    /* lanes 16-31 carry the B-half index corrections: source px live
       at src-lane 8+, output bins at acc-lane 16+ */
    const __m512i bbase = _mm512_set_epi16(
        8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8,
        0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0);
    __m512i acc0 = _mm512_setzero_si512(), acc1 = acc0, acc3 = acc0,
            acc4 = acc0, acc5 = acc0, acc7 = acc0, accp0 = acc0,
            accp1 = acc0;
    __m256i acc6 = _mm256_setzero_si256();
#define CDP_IDXF(s) _mm512_sub_epi16(_mm512_sub_epi16(lane32, \
        _mm512_set1_epi16((short)(s))), bbase)
#define CDP_IDXR(s) _mm512_sub_epi16(_mm512_add_epi16( \
        _mm512_set1_epi16((short)(s)), \
        _mm512_add_epi16(bbase, _mm512_slli_epi16(bbase, 1))), lane32)
#define CDP_M8(s) ((__mmask32)(((uint32_t)(0xFFu << (s)) & 0xFFFF) \
        | (((uint32_t)(0xFFu << (s)) & 0xFFFF) << 16)))
#define CDP_M4(s) ((__mmask32)(((uint32_t)(0x0Fu << (s)) & 0xFFFF) \
        | (((uint32_t)(0x0Fu << (s)) & 0xFFFF) << 16)))
#if PEL_BITS == 8
#define CDP_LD(i, v) \
    __m256i v = _mm256_cvtepu8_epi16(_mm_loadu_si128( \
        (const __m128i *)(src + (int64_t)(i) * stride))); \
    if (coeff_shift) v = _mm256_srai_epi16(v, coeff_shift); \
    v = _mm256_sub_epi16(v, c128y);
#else
#define CDP_LD(i, v) \
    __m256i v = _mm256_loadu_si256( \
        (const __m256i *)(src + (int64_t)(i) * stride)); \
    if (coeff_shift) v = _mm256_srai_epi16(v, coeff_shift); \
    v = _mm256_sub_epi16(v, c128y);
#endif
#define CDP_ROW(i, v) do { \
    __m512i x = _mm512_castsi256_si512(v); \
    acc0 = _mm512_add_epi16(acc0, _mm512_maskz_permutexvar_epi16( \
        CDP_M8(i), CDP_IDXF(i), x)); \
    acc4 = _mm512_add_epi16(acc4, _mm512_maskz_permutexvar_epi16( \
        CDP_M8(i), CDP_IDXR(7 + (i)), x)); \
    __m256i psy = _mm256_hadd_epi16(v, v); \
    __m512i ps = _mm512_castsi256_si512(psy); \
    acc1 = _mm512_add_epi16(acc1, _mm512_maskz_permutexvar_epi16( \
        CDP_M4(i), CDP_IDXF(i), ps)); \
    acc3 = _mm512_add_epi16(acc3, _mm512_maskz_permutexvar_epi16( \
        CDP_M4(i), CDP_IDXR(3 + (i)), ps)); \
    acc6 = _mm256_add_epi16(acc6, v); \
    if ((i) < 4) \
        accp0 = _mm512_add_epi16(accp0, _mm512_maskz_permutexvar_epi16( \
            CDP_M4((4 * (i)) & 15), CDP_IDXF((4 * (i)) & 15), ps)); \
    else \
        accp1 = _mm512_add_epi16(accp1, _mm512_maskz_permutexvar_epi16( \
            CDP_M4((4 * ((i) - 4)) & 15), \
            CDP_IDXF((4 * ((i) - 4)) & 15), ps)); \
} while (0)
#define CDP_PAIR(i) do { \
    CDP_LD(i, xa) CDP_LD((i) + 1, xb) \
    CDP_ROW(i, xa); CDP_ROW((i) + 1, xb); \
    __m512i xpv = _mm512_castsi256_si512(_mm256_add_epi16(xa, xb)); \
    acc5 = _mm512_add_epi16(acc5, _mm512_maskz_permutexvar_epi16( \
        CDP_M8(3 - ((i) >> 1)), CDP_IDXF(3 - ((i) >> 1)), xpv)); \
    acc7 = _mm512_add_epi16(acc7, _mm512_maskz_permutexvar_epi16( \
        CDP_M8((i) >> 1), CDP_IDXF((i) >> 1), xpv)); \
} while (0)
    { CDP_PAIR(0); }
    { CDP_PAIR(2); }
    { CDP_PAIR(4); }
    { CDP_PAIR(6); }
#undef CDP_LD
#undef CDP_ROW
#undef CDP_PAIR
#undef CDP_IDXF
#undef CDP_IDXR
#undef CDP_M8
#undef CDP_M4
    static const int32_t cdpd15[16] __attribute__((aligned(64))) = {
        840, 420, 280, 210, 168, 140, 120, 105,
        120, 140, 168, 210, 280, 420, 840, 0};
    static const int32_t cdpd11[16] __attribute__((aligned(64))) = {
        420, 210, 140, 105, 105, 105, 105, 105, 140, 210, 420, 0, 0, 0,
        0, 0};
    const __m512i d15 = _mm512_load_si512(cdpd15);
    const __m512i d11 = _mm512_load_si512(cdpd11);
    int32_t costA[8], costB[8];
#define CDP_COST2(dA, dB, acc, dv) do { \
    __m512i wa = _mm512_cvtepi16_epi32(_mm512_castsi512_si256(acc)); \
    __m512i wb = _mm512_cvtepi16_epi32( \
        _mm512_extracti64x4_epi64(acc, 1)); \
    __m512i sa = _mm512_mullo_epi32(wa, wa); \
    __m512i sb = _mm512_mullo_epi32(wb, wb); \
    dA = (int32_t)_mm512_reduce_add_epi32(_mm512_mullo_epi32(sa, dv)); \
    dB = (int32_t)_mm512_reduce_add_epi32(_mm512_mullo_epi32(sb, dv)); \
} while (0)
    CDP_COST2(costA[0], costB[0], acc0, d15);
    CDP_COST2(costA[4], costB[4], acc4, d15);
    CDP_COST2(costA[1], costB[1], acc1, d11);
    CDP_COST2(costA[3], costB[3], acc3, d11);
    CDP_COST2(costA[5], costB[5], acc5, d11);
    CDP_COST2(costA[7], costB[7], acc7, d11);
#undef CDP_COST2
    /* d2 (row sums) and d6 (col sums): 105 * sum(s^2) per block */
    __m512i m0 = _mm512_madd_epi16(accp0, _mm512_set1_epi16(1));
    __m512i m1 = _mm512_madd_epi16(accp1, _mm512_set1_epi16(1));
    __m512i rs0 = _mm512_add_epi32(
        _mm512_shuffle_epi32(m0, _MM_PERM_CDAB), m0);
    __m512i rs1 = _mm512_add_epi32(
        _mm512_shuffle_epi32(m1, _MM_PERM_CDAB), m1);
    __m512i sq0 = _mm512_mullo_epi32(rs0, rs0);
    __m512i sq1 = _mm512_mullo_epi32(rs1, rs1);
    const __mmask16 evn = 0x5555;
    __m512i z512c = _mm512_setzero_si512();
    __m512i esum = _mm512_add_epi32(
        _mm512_mask_mov_epi32(z512c, evn, sq0),
        _mm512_mask_mov_epi32(z512c, evn, sq1));
    __m256i loA = _mm512_castsi512_si256(esum);
    __m256i hiB = _mm512_extracti64x4_epi64(esum, 1);
    __m128i ra = _mm_add_epi32(_mm256_castsi256_si128(loA),
                               _mm256_extracti128_si256(loA, 1));
    __m128i rb = _mm_add_epi32(_mm256_castsi256_si128(hiB),
                               _mm256_extracti128_si256(hiB, 1));
    ra = _mm_add_epi32(ra, _mm_srli_si128(ra, 8));
    ra = _mm_add_epi32(ra, _mm_srli_si128(ra, 4));
    rb = _mm_add_epi32(rb, _mm_srli_si128(rb, 8));
    rb = _mm_add_epi32(rb, _mm_srli_si128(rb, 4));
    costA[2] = 105 * _mm_cvtsi128_si32(ra);
    costB[2] = 105 * _mm_cvtsi128_si32(rb);
    __m512i c6w = _mm512_cvtepi16_epi32(acc6);
    __m512i q6 = _mm512_mullo_epi32(c6w, c6w);
    __m256i l6 = _mm512_castsi512_si256(q6);
    __m256i h6 = _mm512_extracti64x4_epi64(q6, 1);
    __m128i sa6 = _mm_add_epi32(_mm256_castsi256_si128(l6),
                                _mm256_extracti128_si256(l6, 1));
    __m128i sb6 = _mm_add_epi32(_mm256_castsi256_si128(h6),
                                _mm256_extracti128_si256(h6, 1));
    sa6 = _mm_add_epi32(sa6, _mm_srli_si128(sa6, 8));
    sa6 = _mm_add_epi32(sa6, _mm_srli_si128(sa6, 4));
    sb6 = _mm_add_epi32(sb6, _mm_srli_si128(sb6, 8));
    sb6 = _mm_add_epi32(sb6, _mm_srli_si128(sb6, 4));
    costA[6] = 105 * _mm_cvtsi128_si32(sa6);
    costB[6] = 105 * _mm_cvtsi128_si32(sb6);
    int bA = 0, bB = 0;
    for (int d = 1; d < 8; d++) {
        if (costA[d] > costA[bA]) bA = d;
        if (costB[d] > costB[bB]) bB = d;
    }
    *dirA = bA;
    *varA = (costA[bA] - costA[(bA + 4) & 7]) >> 10;
    *dirB = bB;
    *varB = (costB[bB] - costB[(bB + 4) & 7]) >> 10;
}
#endif /* AVX512BW+VL */

static void cdef_find_dir(const pel *src, int stride, int coeff_shift,
                          int *out_dir, int *out_var) {
#if defined(__AVX512BW__) && defined(__AVX512VL__)
    /* epi16 ymm projections: partial sums fit int16 (|8 x 1023| after
       the -128 bias), so each direction's row placement is a single
       maskz_permutexvar_epi16 — half the port-5 pressure of the
       512-bit epi32 path (208 -> 124 cycles/block measured).  Rows
       are processed in pairs so directions 5/7 (shift = i>>1) pay one
       permute per pair.  Bit-exact vs the scalar loop: the cost
       reduction widens to int32 before the wrapping mullo chain. */
    const __m128i c128x = _mm_set1_epi16(128);
    const __m256i lane =
        _mm256_setr_epi16(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13,
                          14, 15);
    __m256i acc0 = _mm256_setzero_si256(), acc1 = acc0, acc3 = acc0,
            acc4 = acc0, acc5 = acc0, acc7 = acc0, accp0 = acc0,
            accp1 = acc0;
    __m128i acc6 = _mm_setzero_si128();
#if PEL_BITS == 8
#define CDEF_DIR_LD(i, v) \
    __m128i v = _mm_cvtepu8_epi16( \
        _mm_loadl_epi64((const __m128i *)(src + (int64_t)(i) * stride))); \
    if (coeff_shift) v = _mm_srai_epi16(v, coeff_shift); \
    v = _mm_sub_epi16(v, c128x);
#else
#define CDEF_DIR_LD(i, v) \
    __m128i v = _mm_loadu_si128( \
        (const __m128i *)(src + (int64_t)(i) * stride)); \
    if (coeff_shift) v = _mm_srai_epi16(v, coeff_shift); \
    v = _mm_sub_epi16(v, c128x);
#endif
#define CDEF_DIR_ROW(i, v) do { \
    __m256i x = _mm256_castsi128_si256(v); \
    __m256i idf = _mm256_sub_epi16(lane, _mm256_set1_epi16(i)); \
    acc0 = _mm256_add_epi16(acc0, _mm256_maskz_permutexvar_epi16( \
        (__mmask16)(0xFFu << (i)), idf, x)); \
    acc4 = _mm256_add_epi16(acc4, _mm256_maskz_permutexvar_epi16( \
        (__mmask16)(0xFFu << (i)), \
        _mm256_sub_epi16(_mm256_set1_epi16(7 + (i)), lane), x)); \
    __m128i ps = _mm_hadd_epi16(v, v); \
    __m256i pv = _mm256_castsi128_si256(ps); \
    acc1 = _mm256_add_epi16(acc1, _mm256_maskz_permutexvar_epi16( \
        (__mmask16)(0x0Fu << (i)), idf, pv)); \
    acc3 = _mm256_add_epi16(acc3, _mm256_maskz_permutexvar_epi16( \
        (__mmask16)(0x0Fu << (i)), \
        _mm256_sub_epi16(_mm256_set1_epi16(3 + (i)), lane), pv)); \
    acc6 = _mm_add_epi16(acc6, v); \
    if ((i) < 4) \
        accp0 = _mm256_add_epi16(accp0, _mm256_maskz_permutexvar_epi16( \
            (__mmask16)(0x0Fu << ((4 * (i)) & 15)), \
            _mm256_sub_epi16(lane, _mm256_set1_epi16(4 * (i))), pv)); \
    else \
        accp1 = _mm256_add_epi16(accp1, _mm256_maskz_permutexvar_epi16( \
            (__mmask16)(0x0Fu << ((4 * ((i) - 4)) & 15)), \
            _mm256_sub_epi16(lane, _mm256_set1_epi16(4 * ((i) - 4))), \
            pv)); \
} while (0)
#define CDEF_DIR_PAIR(i) do { \
    CDEF_DIR_LD(i, xa) CDEF_DIR_LD((i) + 1, xb) \
    CDEF_DIR_ROW(i, xa); CDEF_DIR_ROW((i) + 1, xb); \
    __m256i xpv = _mm256_castsi128_si256(_mm_add_epi16(xa, xb)); \
    acc5 = _mm256_add_epi16(acc5, _mm256_maskz_permutexvar_epi16( \
        (__mmask16)(0xFFu << (3 - ((i) >> 1))), \
        _mm256_sub_epi16(lane, _mm256_set1_epi16(3 - ((i) >> 1))), \
        xpv)); \
    acc7 = _mm256_add_epi16(acc7, _mm256_maskz_permutexvar_epi16( \
        (__mmask16)(0xFFu << ((i) >> 1)), \
        _mm256_sub_epi16(lane, _mm256_set1_epi16((i) >> 1)), xpv)); \
} while (0)
    { CDEF_DIR_PAIR(0); }
    { CDEF_DIR_PAIR(2); }
    { CDEF_DIR_PAIR(4); }
    { CDEF_DIR_PAIR(6); }
#undef CDEF_DIR_LD
#undef CDEF_DIR_ROW
#undef CDEF_DIR_PAIR
    static const int32_t cdd15[16] __attribute__((aligned(64))) = {
        840, 420, 280, 210, 168, 140, 120, 105,
        120, 140, 168, 210, 280, 420, 840, 0};
    static const int32_t cdd11[16] __attribute__((aligned(64))) = {
        420, 210, 140, 105, 105, 105, 105, 105, 140, 210, 420, 0, 0, 0,
        0, 0};
    const __m512i d15 = _mm512_load_si512(cdd15);
    const __m512i d11 = _mm512_load_si512(cdd11);
    int32_t cost[8];
#define CDEF_DIR_COST(dst, acc, dv) do { \
    __m512i wv = _mm512_cvtepi16_epi32(acc); \
    __m512i sq = _mm512_mullo_epi32(wv, wv); \
    dst = (int32_t)_mm512_reduce_add_epi32(_mm512_mullo_epi32(sq, dv)); \
} while (0)
    CDEF_DIR_COST(cost[0], acc0, d15);
    CDEF_DIR_COST(cost[4], acc4, d15);
    CDEF_DIR_COST(cost[1], acc1, d11);
    CDEF_DIR_COST(cost[3], acc3, d11);
    CDEF_DIR_COST(cost[5], acc5, d11);
    CDEF_DIR_COST(cost[7], acc7, d11);
#undef CDEF_DIR_COST
    /* d2 (row sums, from the packed pair-sum accumulators) and d6
       (column sums): 105 * sum(s^2) over 8 entries */
    __m256i m0 = _mm256_madd_epi16(accp0, _mm256_set1_epi16(1));
    __m256i m1 = _mm256_madd_epi16(accp1, _mm256_set1_epi16(1));
    __m256i rs01 = _mm256_hadd_epi32(m0, m1);
    __m256i sq2 = _mm256_mullo_epi32(rs01, rs01);
    __m128i s2 = _mm_add_epi32(_mm256_castsi256_si128(sq2),
                               _mm256_extracti128_si256(sq2, 1));
    s2 = _mm_add_epi32(s2, _mm_srli_si128(s2, 8));
    s2 = _mm_add_epi32(s2, _mm_srli_si128(s2, 4));
    cost[2] = 105 * _mm_cvtsi128_si32(s2);
    __m256i c6 = _mm256_cvtepi16_epi32(acc6);
    __m256i sq6 = _mm256_mullo_epi32(c6, c6);
    __m128i s6 = _mm_add_epi32(_mm256_castsi256_si128(sq6),
                               _mm256_extracti128_si256(sq6, 1));
    s6 = _mm_add_epi32(s6, _mm_srli_si128(s6, 8));
    s6 = _mm_add_epi32(s6, _mm_srli_si128(s6, 4));
    cost[6] = 105 * _mm_cvtsi128_si32(s6);
    int bwbest = 0;
    for (int d = 1; d < 8; d++)
        if (cost[d] > cost[bwbest]) bwbest = d;
    *out_dir = bwbest;
    *out_var = (cost[bwbest] - cost[(bwbest + 4) & 7]) >> 10;
    return;
#elif defined(__AVX512F__) && defined(__AVX2__)
    /* register-resident partial sums: each direction's projection is a
       lane-shifted accumulation (valignd against zero), so the 8-row
       loop never round-trips the part[] arrays through memory */
    int32_t part[8][16] __attribute__((aligned(64)));
    {
        const __m512i z512 = _mm512_setzero_si512();
        __m512i acc0 = z512, acc1 = z512, acc3 = z512, acc4 = z512,
                acc5 = z512, acc7 = z512;
        __m256i acc6 = _mm256_setzero_si256();
        const __m256i rev = _mm256_setr_epi32(7, 6, 5, 4, 3, 2, 1, 0);
        const __m256i c128 = _mm256_set1_epi32(128);
        int32_t rowsum[8];
/* zmm shifted left by L lanes (L is a literal; 0 folds to identity) */
#define CDEF_SHL(zv, L) \
        ((L) == 0 ? (zv) : _mm512_alignr_epi32((zv), z512, (16 - (L)) & 15))
#if PEL_BITS == 8
#define CDEF_LDROW(ptr) _mm256_cvtepu8_epi32( \
        _mm_loadl_epi64((const __m128i *)(ptr)))
#else
#define CDEF_LDROW(ptr) _mm256_cvtepi16_epi32( \
        _mm_loadu_si128((const __m128i *)(ptr)))
#endif
#define CDEF_ROW(i) do { \
        __m256i x = CDEF_LDROW(src + (int64_t)(i) * stride); \
        if (coeff_shift) x = _mm256_srai_epi32(x, coeff_shift); \
        x = _mm256_sub_epi32(x, c128); \
        acc6 = _mm256_add_epi32(acc6, x); \
        __m256i xr = _mm256_permutevar8x32_epi32(x, rev); \
        __m512i zx = _mm512_inserti64x4(z512, x, 0); \
        __m512i zxr = _mm512_inserti64x4(z512, xr, 0); \
        acc0 = _mm512_add_epi32(acc0, CDEF_SHL(zx, (i))); \
        acc4 = _mm512_add_epi32(acc4, CDEF_SHL(zxr, (i))); \
        acc5 = _mm512_add_epi32(acc5, CDEF_SHL(zx, 3 - ((i) >> 1))); \
        acc7 = _mm512_add_epi32(acc7, CDEF_SHL(zx, (i) >> 1)); \
        __m128i lo = _mm256_castsi256_si128(x); \
        __m128i hi = _mm256_extracti128_si256(x, 1); \
        __m128i ps = _mm_hadd_epi32(lo, hi); \
        __m128i psr = _mm_shuffle_epi32(ps, 0x1B); \
        __m512i zp = _mm512_inserti32x4(z512, ps, 0); \
        __m512i zpr = _mm512_inserti32x4(z512, psr, 0); \
        acc1 = _mm512_add_epi32(acc1, CDEF_SHL(zp, (i))); \
        acc3 = _mm512_add_epi32(acc3, CDEF_SHL(zpr, (i))); \
        __m128i rs = _mm_add_epi32(ps, _mm_srli_si128(ps, 8)); \
        rs = _mm_add_epi32(rs, _mm_srli_si128(rs, 4)); \
        rowsum[i] = _mm_cvtsi128_si32(rs); \
    } while (0)
        CDEF_ROW(0); CDEF_ROW(1); CDEF_ROW(2); CDEF_ROW(3);
        CDEF_ROW(4); CDEF_ROW(5); CDEF_ROW(6); CDEF_ROW(7);
#undef CDEF_ROW
#undef CDEF_SHL
#undef CDEF_LDROW
        _mm512_store_si512((__m512i *)part[0], acc0);
        _mm512_store_si512((__m512i *)part[1], acc1);
        _mm512_store_si512((__m512i *)part[3], acc3);
        _mm512_store_si512((__m512i *)part[4], acc4);
        _mm512_store_si512((__m512i *)part[5], acc5);
        _mm512_store_si512((__m512i *)part[7], acc7);
        memcpy(part[2], rowsum, sizeof(rowsum));
        memset(part[2] + 8, 0, 8 * sizeof(int32_t));
        _mm256_store_si256((__m256i *)part[6], acc6);
        memset(part[6] + 8, 0, 8 * sizeof(int32_t));
    }
#elif defined(__AVX2__)
    /* row-vector accumulation: each of the 8 direction projections is a
       sliding-window add of the row (or its reverse / pair-sums) */
    int32_t part[8][16];
    memset(part, 0, sizeof(part));
    const __m256i c128 = _mm256_set1_epi32(128);
    const __m256i rev = _mm256_setr_epi32(7, 6, 5, 4, 3, 2, 1, 0);
    for (int i = 0; i < 8; i++) {
#if PEL_BITS == 8
        __m256i x = _mm256_cvtepu8_epi32(_mm_loadl_epi64(
            (const __m128i *)(src + (int64_t)i * stride)));
#else
        __m256i x = _mm256_cvtepi16_epi32(_mm_loadu_si128(
            (const __m128i *)(src + (int64_t)i * stride)));
#endif
        if (coeff_shift) x = _mm256_srai_epi32(x, coeff_shift);
        x = _mm256_sub_epi32(x, c128);
        __m256i p = _mm256_loadu_si256((__m256i *)(part[0] + i));
        _mm256_storeu_si256((__m256i *)(part[0] + i),
                            _mm256_add_epi32(p, x));
        p = _mm256_loadu_si256((__m256i *)part[6]);
        _mm256_storeu_si256((__m256i *)part[6], _mm256_add_epi32(p, x));
        __m256i xr = _mm256_permutevar8x32_epi32(x, rev);
        p = _mm256_loadu_si256((__m256i *)(part[4] + i));
        _mm256_storeu_si256((__m256i *)(part[4] + i),
                            _mm256_add_epi32(p, xr));
        int o5 = 3 - (i >> 1);
        p = _mm256_loadu_si256((__m256i *)(part[5] + o5));
        _mm256_storeu_si256((__m256i *)(part[5] + o5),
                            _mm256_add_epi32(p, x));
        int o7 = i >> 1;
        p = _mm256_loadu_si256((__m256i *)(part[7] + o7));
        _mm256_storeu_si256((__m256i *)(part[7] + o7),
                            _mm256_add_epi32(p, x));
        __m128i lo = _mm256_castsi256_si128(x);
        __m128i hi = _mm256_extracti128_si256(x, 1);
        __m128i ps = _mm_hadd_epi32(lo, hi);
        __m128i q = _mm_loadu_si128((__m128i *)(part[1] + i));
        _mm_storeu_si128((__m128i *)(part[1] + i), _mm_add_epi32(q, ps));
        __m128i psr = _mm_shuffle_epi32(ps, _MM_SHUFFLE(0, 1, 2, 3));
        q = _mm_loadu_si128((__m128i *)(part[3] + i));
        _mm_storeu_si128((__m128i *)(part[3] + i), _mm_add_epi32(q, psr));
        __m128i s = _mm_add_epi32(lo, hi);
        s = _mm_add_epi32(s, _mm_srli_si128(s, 8));
        s = _mm_add_epi32(s, _mm_srli_si128(s, 4));
        part[2][i] = _mm_cvtsi128_si32(s);
    }
#else
    int32_t part[8][16];
    memset(part, 0, sizeof(part));
    for (int i = 0; i < 8; i++)
        for (int j = 0; j < 8; j++) {
            int x = (src[i * stride + j] >> coeff_shift) - 128;
            part[0][i + j] += x;
            part[1][i + (j >> 1)] += x;
            part[2][i] += x;
            part[3][3 + i - (j >> 1)] += x;
            part[4][7 + i - j] += x;
            part[5][3 - (i >> 1) + j] += x;
            part[6][j] += x;
            part[7][(i >> 1) + j] += x;
        }
#endif
#if !(defined(__AVX512BW__) && defined(__AVX512VL__))
    /* cost[d] = sum_i part[d][i]^2 * divtbl[d][i]; everything fits
       int32 for 8-bit-normalized inputs (max total < 2^30), so the
       whole 8x16 reduction auto-vectorizes as int32 lanes */
    static const int32_t divtbl[8][16] __attribute__((aligned(64))) = {
        /* d even, 15 diagonals (lengths 1..8..1) */
        {840, 420, 280, 210, 168, 140, 120, 105,
         120, 140, 168, 210, 280, 420, 840, 0},
        /* d odd, 11 entries: 3 edge pairs + 5 center */
        {420, 210, 140, 105, 105, 105, 105, 105, 140, 210, 420, 0, 0, 0,
         0, 0},
        /* horizontal/vertical: 8 full rows */
        {105, 105, 105, 105, 105, 105, 105, 105, 0, 0, 0, 0, 0, 0, 0, 0},
        {420, 210, 140, 105, 105, 105, 105, 105, 140, 210, 420, 0, 0, 0,
         0, 0},
        {840, 420, 280, 210, 168, 140, 120, 105,
         120, 140, 168, 210, 280, 420, 840, 0},
        {420, 210, 140, 105, 105, 105, 105, 105, 140, 210, 420, 0, 0, 0,
         0, 0},
        {105, 105, 105, 105, 105, 105, 105, 105, 0, 0, 0, 0, 0, 0, 0, 0},
        {420, 210, 140, 105, 105, 105, 105, 105, 140, 210, 420, 0, 0, 0,
         0, 0},
    };
    int32_t cost[8];
#if defined(__AVX512F__)
    /* vectorized cost: vpmulld wraps mod 2^32 exactly like the scalar
       int32 products, so the reduction is bit-identical */
    for (int d = 0; d < 8; d++) {
        __m512i pv = _mm512_loadu_si512((const void *)part[d]);
        __m512i dv = _mm512_loadu_si512((const void *)divtbl[d]);
        __m512i sq = _mm512_mullo_epi32(pv, pv);
        cost[d] = (int32_t)_mm512_reduce_add_epi32(
            _mm512_mullo_epi32(sq, dv));
    }
#else
    for (int d = 0; d < 8; d++) {
        int32_t s = 0;
        for (int i = 0; i < 16; i++)
            s += part[d][i] * part[d][i] * divtbl[d][i];
        cost[d] = s;
    }
#endif
    int best = 0;
    for (int d = 1; d < 8; d++)
        if (cost[d] > cost[best]) best = d;
    *out_dir = best;
    *out_var = (cost[best] - cost[(best + 4) & 7]) >> 10;
#endif /* !AVX512BW path */
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
/* two-row int16 load at a tap offset */
static inline __m256i cdef_ld2(const int16_t *r0, const int16_t *r1,
                               int w, int64_t off) {
    if (w == 8)
        return _mm256_inserti128_si256(
            _mm256_castsi128_si256(
                _mm_loadu_si128((const __m128i *)(r0 + off))),
            _mm_loadu_si128((const __m128i *)(r1 + off)), 1);
    return _mm256_castsi128_si256(_mm_unpacklo_epi64(
        _mm_loadl_epi64((const __m128i *)(r0 + off)),
        _mm_loadl_epi64((const __m128i *)(r1 + off))));
}

/* one constrained tap: s += w * constrain(v - px); min/max track
   non-sentinel neighbors.  `edged`: sentinels (CDEF_VERY_LARGE) can
   appear only in frame-border blocks; the sentinel is larger than any
   real sample, so `mn` needs no masking ever, and `mx` masks the
   sentinel to 0 (never raises a max that starts at px) only when
   edged.  always_inline + literal edged -> gcc clones a branch-free
   interior kernel. */
static inline __attribute__((always_inline)) __m256i
cdef_tap(__m256i v, __m256i px, __m256i vthr,
         __m128i vsh, __m256i vw, __m256i s,
         __m256i *mx, __m256i *mn, __m256i vlarge, int edged) {
    __m256i diff = _mm256_sub_epi16(v, px);
    __m256i ad = _mm256_abs_epi16(diff);
    __m256i rhs = _mm256_sub_epi16(vthr, _mm256_srl_epi16(ad, vsh));
    rhs = _mm256_max_epi16(rhs, _mm256_setzero_si256());
    __m256i mag = _mm256_min_epi16(ad, rhs);
    __m256i m = _mm256_srai_epi16(diff, 15);
    __m256i con = _mm256_sub_epi16(_mm256_xor_si256(mag, m), m);
    __m256i vx = v;
    if (edged)
        vx = _mm256_andnot_si256(_mm256_cmpeq_epi16(v, vlarge), v);
    *mx = _mm256_max_epi16(*mx, vx);
    *mn = _mm256_min_epi16(*mn, v);
    return _mm256_add_epi16(s, _mm256_mullo_epi16(vw, con));
}

/* int16 lanes, two rows per vector; the pri(4) + sec(8) tap structure
   is hardcoded (spec 7.15.3) so per-block setup is a handful of
   broadcasts instead of generic per-tap arrays */
static inline __attribute__((always_inline)) void
cdef_filter_rows_avx2(pel *dst, int dstride,
                      const int16_t *src, int sstride,
                      int x, int y, int w, int h,
                      int pri, int sec, int pt0, int pt1,
                      int pri_shift, int sec_shift, int dir, int edged) {
    const __m256i vlarge = _mm256_set1_epi16(CDEF_VERY_LARGE);
    const __m256i zero = _mm256_setzero_si256();
    const __m256i eight = _mm256_set1_epi16(8);
    const __m256i vpthr = _mm256_set1_epi16((short)pri);
    const __m256i vsthr = _mm256_set1_epi16((short)sec);
    const __m128i vpsh = _mm_cvtsi32_si128(pri_shift);
    const __m128i vssh = _mm_cvtsi32_si128(sec_shift);
    const __m256i vw0 = _mm256_set1_epi16((short)pt0);
    const __m256i vw1 = _mm256_set1_epi16((short)pt1);
    const __m256i vw2 = _mm256_set1_epi16(2);
    const __m256i vw3 = _mm256_set1_epi16(1);
    const int8_t (*d0)[2] = CDEF_DIRS[dir];
    const int64_t po0 = (int64_t)d0[0][0] * sstride + d0[0][1];
    const int64_t po1 = (int64_t)d0[1][0] * sstride + d0[1][1];
    const int8_t (*s1)[2] = CDEF_DIRS[(dir + 2) & 7];
    const int8_t (*s2)[2] = CDEF_DIRS[(dir + 6) & 7];
    const int64_t so0 = (int64_t)s1[0][0] * sstride + s1[0][1];
    const int64_t so1 = (int64_t)s1[1][0] * sstride + s1[1][1];
    const int64_t so2 = (int64_t)s2[0][0] * sstride + s2[0][1];
    const int64_t so3 = (int64_t)s2[1][0] * sstride + s2[1][1];
    for (int i = 0; i < h; i += 2) {
        const int16_t *r0 = src + (int64_t)(y + i + 2) * sstride + x + 2;
        const int16_t *r1 = r0 + sstride;
        __m256i px = cdef_ld2(r0, r1, w, 0), s = zero;
        __m256i mx = px, mn = px;
        if (pri) {
            s = cdef_tap(cdef_ld2(r0, r1, w, po0), px, vpthr, vpsh, vw0,
                         s, &mx, &mn, vlarge, edged);
            s = cdef_tap(cdef_ld2(r0, r1, w, -po0), px, vpthr, vpsh, vw0,
                         s, &mx, &mn, vlarge, edged);
            s = cdef_tap(cdef_ld2(r0, r1, w, po1), px, vpthr, vpsh, vw1,
                         s, &mx, &mn, vlarge, edged);
            s = cdef_tap(cdef_ld2(r0, r1, w, -po1), px, vpthr, vpsh, vw1,
                         s, &mx, &mn, vlarge, edged);
        }
        if (sec) {
            s = cdef_tap(cdef_ld2(r0, r1, w, so0), px, vsthr, vssh, vw2,
                         s, &mx, &mn, vlarge, edged);
            s = cdef_tap(cdef_ld2(r0, r1, w, -so0), px, vsthr, vssh, vw2,
                         s, &mx, &mn, vlarge, edged);
            s = cdef_tap(cdef_ld2(r0, r1, w, so2), px, vsthr, vssh, vw2,
                         s, &mx, &mn, vlarge, edged);
            s = cdef_tap(cdef_ld2(r0, r1, w, -so2), px, vsthr, vssh, vw2,
                         s, &mx, &mn, vlarge, edged);
            s = cdef_tap(cdef_ld2(r0, r1, w, so1), px, vsthr, vssh, vw3,
                         s, &mx, &mn, vlarge, edged);
            s = cdef_tap(cdef_ld2(r0, r1, w, -so1), px, vsthr, vssh, vw3,
                         s, &mx, &mn, vlarge, edged);
            s = cdef_tap(cdef_ld2(r0, r1, w, so3), px, vsthr, vssh, vw3,
                         s, &mx, &mn, vlarge, edged);
            s = cdef_tap(cdef_ld2(r0, r1, w, -so3), px, vsthr, vssh, vw3,
                         s, &mx, &mn, vlarge, edged);
        }
        /* val = px + ((8 + s - (s<0)) >> 4) */
        __m256i adj = _mm256_add_epi16(_mm256_add_epi16(eight, s),
                                       _mm256_srai_epi16(s, 15));
        __m256i val = _mm256_add_epi16(px, _mm256_srai_epi16(adj, 4));
        val = _mm256_min_epi16(_mm256_max_epi16(val, mn), mx);
        pel *d0_ = dst + (int64_t)(y + i) * dstride + x;
        pel *d1_ = d0_ + dstride;
#if PEL_BITS == 8
        if (w == 8) {
            /* rows are int16 <= 255: packus narrows exactly */
            __m128i pk = _mm_packus_epi16(
                _mm256_castsi256_si128(val),
                _mm256_extracti128_si256(val, 1));
            _mm_storel_epi64((__m128i *)d0_, pk);
            _mm_storel_epi64((__m128i *)d1_, _mm_srli_si128(pk, 8));
        } else {
            __m128i v128 = _mm256_castsi256_si128(val);
            __m128i pk = _mm_packus_epi16(v128, v128);
            cdef_st32(d0_, _mm_cvtsi128_si32(pk));
            cdef_st32(d1_, _mm_cvtsi128_si32(_mm_srli_si128(pk, 4)));
        }
#else
        if (w == 8) {
            _mm_storeu_si128((__m128i *)d0_,
                             _mm256_castsi256_si128(val));
            _mm_storeu_si128((__m128i *)d1_,
                             _mm256_extracti128_si256(val, 1));
        } else {
            __m128i v128 = _mm256_castsi256_si128(val);
            _mm_storel_epi64((__m128i *)d0_, v128);
            _mm_storel_epi64((__m128i *)d1_, _mm_srli_si128(v128, 8));
        }
#endif
    }
}

#if defined(__AVX512BW__) && defined(__AVX512VL__)
/* AVX-512 U+V-paired chroma filter (ssx=1: 4-wide blocks).  U and V
 * share direction, strengths and damping (spec 7.15.3), so both
 * planes filter in one pass: tmp rows are [U window(8) | V window(8)]
 * int16 with row stride 16, and one 512-bit load at element offset
 * (row+dy)*16 + dx covers two rows of BOTH planes with element-wise
 * tap correspondence (useful lanes 0-3/8-11/16-19/24-27). */
static inline __attribute__((always_inline)) __m512i
cdef_tap512(__m512i v, __m512i px, __m512i vthr, __m128i vsh,
            __m512i vw, __m512i s, __m512i *mx, __m512i *mn,
            __m512i vlarge, int edged) {
    __m512i diff = _mm512_sub_epi16(v, px);
    __m512i ad = _mm512_abs_epi16(diff);
    __m512i rhs = _mm512_sub_epi16(vthr, _mm512_srl_epi16(ad, vsh));
    rhs = _mm512_max_epi16(rhs, _mm512_setzero_si512());
    __m512i mag = _mm512_min_epi16(ad, rhs);
    __m512i m = _mm512_srai_epi16(diff, 15);
    __m512i con = _mm512_sub_epi16(_mm512_xor_si512(mag, m), m);
    __m512i vx = v;
    if (edged)
        vx = _mm512_maskz_mov_epi16(
            _mm512_cmpneq_epi16_mask(v, vlarge), v);
    *mx = _mm512_max_epi16(*mx, vx);
    *mn = _mm512_min_epi16(*mn, v);
    return _mm512_add_epi16(s, _mm512_mullo_epi16(vw, con));
}

static inline __attribute__((always_inline)) void
cdef_filter_uv_avx512(pel *du, pel *dv, int dstride, const int16_t *tmp,
                      int h, int pri, int sec, int pt0, int pt1,
                      int pri_shift, int sec_shift, int dir, int edged) {
    const __m512i vlarge = _mm512_set1_epi16(CDEF_VERY_LARGE);
    const __m512i zero = _mm512_setzero_si512();
    const __m512i eight = _mm512_set1_epi16(8);
    const __m512i vpthr = _mm512_set1_epi16((short)pri);
    const __m512i vsthr = _mm512_set1_epi16((short)sec);
    const __m128i vpsh = _mm_cvtsi32_si128(pri_shift);
    const __m128i vssh = _mm_cvtsi32_si128(sec_shift);
    const __m512i vw0 = _mm512_set1_epi16((short)pt0);
    const __m512i vw1 = _mm512_set1_epi16((short)pt1);
    const __m512i vw2 = _mm512_set1_epi16(2);
    const __m512i vw3 = _mm512_set1_epi16(1);
    const int8_t (*d0)[2] = CDEF_DIRS[dir];
    const int8_t (*s1)[2] = CDEF_DIRS[(dir + 2) & 7];
    const int8_t (*s2)[2] = CDEF_DIRS[(dir + 6) & 7];
    const int64_t po0 = (int64_t)d0[0][0] * CDEF_TSTRIDE + d0[0][1];
    const int64_t po1 = (int64_t)d0[1][0] * CDEF_TSTRIDE + d0[1][1];
    const int64_t so0 = (int64_t)s1[0][0] * CDEF_TSTRIDE + s1[0][1];
    const int64_t so1 = (int64_t)s1[1][0] * CDEF_TSTRIDE + s1[1][1];
    const int64_t so2 = (int64_t)s2[0][0] * CDEF_TSTRIDE + s2[0][1];
    const int64_t so3 = (int64_t)s2[1][0] * CDEF_TSTRIDE + s2[1][1];
    for (int i = 0; i < h; i += 2) {
        const int16_t *b = tmp + (int64_t)(i + 2) * CDEF_TSTRIDE + 2;
#define LD512(off) _mm512_loadu_si512((const void *)(b + (off)))
        __m512i px = LD512(0), s = zero;
        __m512i mx = px, mn = px;
        if (pri) {
            s = cdef_tap512(LD512(po0), px, vpthr, vpsh, vw0, s, &mx,
                            &mn, vlarge, edged);
            s = cdef_tap512(LD512(-po0), px, vpthr, vpsh, vw0, s, &mx,
                            &mn, vlarge, edged);
            s = cdef_tap512(LD512(po1), px, vpthr, vpsh, vw1, s, &mx,
                            &mn, vlarge, edged);
            s = cdef_tap512(LD512(-po1), px, vpthr, vpsh, vw1, s, &mx,
                            &mn, vlarge, edged);
        }
        if (sec) {
            s = cdef_tap512(LD512(so0), px, vsthr, vssh, vw2, s, &mx,
                            &mn, vlarge, edged);
            s = cdef_tap512(LD512(-so0), px, vsthr, vssh, vw2, s, &mx,
                            &mn, vlarge, edged);
            s = cdef_tap512(LD512(so2), px, vsthr, vssh, vw2, s, &mx,
                            &mn, vlarge, edged);
            s = cdef_tap512(LD512(-so2), px, vsthr, vssh, vw2, s, &mx,
                            &mn, vlarge, edged);
            s = cdef_tap512(LD512(so1), px, vsthr, vssh, vw3, s, &mx,
                            &mn, vlarge, edged);
            s = cdef_tap512(LD512(-so1), px, vsthr, vssh, vw3, s, &mx,
                            &mn, vlarge, edged);
            s = cdef_tap512(LD512(so3), px, vsthr, vssh, vw3, s, &mx,
                            &mn, vlarge, edged);
            s = cdef_tap512(LD512(-so3), px, vsthr, vssh, vw3, s, &mx,
                            &mn, vlarge, edged);
        }
#undef LD512
        __m512i adj = _mm512_add_epi16(_mm512_add_epi16(eight, s),
                                       _mm512_srai_epi16(s, 15));
        __m512i val = _mm512_add_epi16(px, _mm512_srai_epi16(adj, 4));
        val = _mm512_min_epi16(_mm512_max_epi16(val, mn), mx);
        __m128i q0 = _mm512_castsi512_si128(val);
        __m128i q1 = _mm512_extracti32x4_epi32(val, 1);
        __m128i q2 = _mm512_extracti32x4_epi32(val, 2);
        __m128i q3 = _mm512_extracti32x4_epi32(val, 3);
#if PEL_BITS == 8
        __m128i p01 = _mm_packus_epi16(q0, q1);
        __m128i p23 = _mm_packus_epi16(q2, q3);
        cdef_st32(du + (int64_t)i * dstride, _mm_cvtsi128_si32(p01));
        cdef_st32(dv + (int64_t)i * dstride,
                  _mm_cvtsi128_si32(_mm_srli_si128(p01, 8)));
        cdef_st32(du + (int64_t)(i + 1) * dstride,
                  _mm_cvtsi128_si32(p23));
        cdef_st32(dv + (int64_t)(i + 1) * dstride,
                  _mm_cvtsi128_si32(_mm_srli_si128(p23, 8)));
#else
        _mm_storel_epi64((__m128i *)(du + (int64_t)i * dstride), q0);
        _mm_storel_epi64((__m128i *)(dv + (int64_t)i * dstride), q1);
        _mm_storel_epi64((__m128i *)(du + (int64_t)(i + 1) * dstride),
                         q2);
        _mm_storel_epi64((__m128i *)(dv + (int64_t)(i + 1) * dstride),
                         q3);
#endif
    }
}
#endif /* AVX512 */
#endif

#if defined(__AVX512BW__) && defined(__AVX512VL__)
/* Direction-banded full filter: processes one plane's whole CDEF
 * block row 32 px per vector straight from the padded stripe, with
 * PER-LANE primary/secondary thresholds, damping shifts (srlv) and
 * primary tap weights, for ONE tap geometry (dir).  Positions are
 * bucketed by their pdir and each bucket filters in a masked pass, so
 * the per-position window staging + filter-call machinery (the
 * dominant chroma CDEF cost: ~165 cyc per position-pair at 1080p)
 * collapses into full-width band arithmetic.  Lanes with pri (sec)
 * threshold 0 contribute nothing to the sum by construction
 * (constrain(_, 0, _) == 0) and are blended out of the min/max clamp
 * range exactly like the per-position kernels skip those taps.
 * Bit-exact: identical int16 arithmetic to cdef_filter_uv_avx512. */
static void cdef_band_dirp(pel *dst, int64_t dstride,
                           const int16_t *sp, int64_t sst,
                           int n_px, int h, int dir,
                           const uint8_t *px_on,
                           const int16_t *pthr_r, const int16_t *psh_r,
                           const int16_t *pw0_r,
                           const int16_t *sthr_r, const int16_t *ssh_r,
                           int rows_edged) {
    const __m512i vlarge = _mm512_set1_epi16(CDEF_VERY_LARGE);
    const __m512i eight = _mm512_set1_epi16(8);
    const __m512i zero = _mm512_setzero_si512();
    const __m512i four = _mm512_set1_epi16(4);
    const __m512i two = _mm512_set1_epi16(2);
    const __m512i three = _mm512_set1_epi16(3);
    const __m512i one = _mm512_set1_epi16(1);
    const int8_t (*d0)[2] = CDEF_DIRS[dir];
    const int8_t (*s1)[2] = CDEF_DIRS[(dir + 2) & 7];
    const int8_t (*s2)[2] = CDEF_DIRS[(dir + 6) & 7];
    const int64_t po0 = (int64_t)d0[0][0] * sst + d0[0][1];
    const int64_t po1 = (int64_t)d0[1][0] * sst + d0[1][1];
    const int64_t so0 = (int64_t)s1[0][0] * sst + s1[0][1];
    const int64_t so1 = (int64_t)s1[1][0] * sst + s1[1][1];
    const int64_t so2 = (int64_t)s2[0][0] * sst + s2[0][1];
    const int64_t so3 = (int64_t)s2[1][0] * sst + s2[1][1];
    /* uniform-row fast path: when every live lane shares one parameter
       set (chroma rows under a single cdef_idx — no per-position var
       adjustment on chroma), the caller passes pw0_r == NULL and
       pthr_r -> 5 scalars {pthr, psh, w0, sthr, ssh}; the broadcasts
       hoist out of the column loop, skipping five 512-bit parameter
       loads per 32-px group */
    const int uni = pw0_r == NULL;
    __m512i u_pthr = zero, u_psh = zero, u_w0 = zero, u_w1 = zero;
    __m512i u_sthr = zero, u_ssh = zero;
    if (uni) {
        u_pthr = _mm512_set1_epi16((short)pthr_r[0]);
        u_psh = _mm512_set1_epi16((short)pthr_r[1]);
        u_w0 = _mm512_set1_epi16((short)pthr_r[2]);
        u_w1 = _mm512_mask_blend_epi16(
            _mm512_cmpeq_epi16_mask(u_w0, four), three, two);
        u_sthr = _mm512_set1_epi16((short)pthr_r[3]);
        u_ssh = _mm512_set1_epi16((short)pthr_r[4]);
    }
    for (int x = 0; x < n_px; x += 32) {
        __m256i onb = _mm256_loadu_si256((const __m256i *)(px_on + x));
        __mmask32 m = _mm256_test_epi8_mask(onb, onb);
        if (x + 32 > n_px)
            m &= (n_px - x >= 32) ? ~0u : ((1u << (n_px - x)) - 1);
        if (!m) continue;
        __m512i vpthr, vpsh, vw0, vw1, vsthr, vssh;
        if (uni) {
            vpthr = u_pthr; vpsh = u_psh; vw0 = u_w0; vw1 = u_w1;
            vsthr = u_sthr; vssh = u_ssh;
        } else {
            vpthr = _mm512_loadu_si512((const void *)(pthr_r + x));
            vpsh = _mm512_loadu_si512((const void *)(psh_r + x));
            vw0 = _mm512_loadu_si512((const void *)(pw0_r + x));
            vw1 = _mm512_mask_blend_epi16(
                _mm512_cmpeq_epi16_mask(vw0, four), three, two);
            vsthr = _mm512_loadu_si512((const void *)(sthr_r + x));
            vssh = _mm512_loadu_si512((const void *)(ssh_r + x));
        }
        const __mmask32 kp = _mm512_cmpneq_epi16_mask(vpthr, zero);
        const __mmask32 ks = _mm512_cmpneq_epi16_mask(vsthr, zero);
        int edged = rows_edged || x == 0 || x + 35 >= n_px + 2;
        /* per-column specialization: drop the pri taps when no live
           lane has a pri strength (the sec-only majority), and the
           min/max activity blends when every live lane is active for
           that tap group (uniform units) — both bit-exact (inactive
           taps contribute 0; dead lanes are never stored) */
        int pri_on = (m & kp) != 0;
        int pblend = (m & ~kp) != 0;
        int sblend = (m & ~ks) != 0;
#define BD_TAP(off, vw, vthr, vshv, kact, BL, E) do { \
            __m512i v = _mm512_loadu_si512((const void *)(row + (off))); \
            __m512i diff = _mm512_sub_epi16(v, px); \
            __m512i ad = _mm512_abs_epi16(diff); \
            __m512i rhs = _mm512_sub_epi16(vthr, \
                                           _mm512_srlv_epi16(ad, vshv)); \
            rhs = _mm512_max_epi16(rhs, zero); \
            __m512i mag = _mm512_min_epi16(ad, rhs); \
            __m512i sgn = _mm512_srai_epi16(diff, 15); \
            __m512i con = _mm512_sub_epi16(_mm512_xor_si512(mag, sgn), \
                                           sgn); \
            s = _mm512_add_epi16(s, _mm512_mullo_epi16(vw, con)); \
            __m512i vx = v; \
            if (E) \
                vx = _mm512_maskz_mov_epi16( \
                    _mm512_cmpneq_epi16_mask(v, vlarge), v); \
            if (BL) { \
                mx = _mm512_max_epi16(mx, \
                    _mm512_mask_mov_epi16(px, kact, vx)); \
                mn = _mm512_min_epi16(mn, \
                    _mm512_mask_mov_epi16(px, kact, v)); \
            } else { \
                mx = _mm512_max_epi16(mx, vx); \
                mn = _mm512_min_epi16(mn, v); \
            } \
        } while (0)
#if PEL_BITS == 8
#define BD_STORE(d, m, val) \
            _mm256_mask_storeu_epi8(d, m, _mm512_cvtusepi16_epi8(val))
#else
#define BD_STORE(d, m, val) _mm512_mask_storeu_epi16(d, m, val)
#endif
#define BD_ROWS(PRI, PBL, SBL, E) \
        for (int i = 0; i < h; i++) { \
            const int16_t *row = sp + (int64_t)(i + 2) * sst + x + 2; \
            __m512i px = _mm512_loadu_si512((const void *)row); \
            __m512i s = zero, mx = px, mn = px; \
            if (PRI) { \
                BD_TAP(po0, vw0, vpthr, vpsh, kp, PBL, E); \
                BD_TAP(-po0, vw0, vpthr, vpsh, kp, PBL, E); \
                BD_TAP(po1, vw1, vpthr, vpsh, kp, PBL, E); \
                BD_TAP(-po1, vw1, vpthr, vpsh, kp, PBL, E); \
            } \
            BD_TAP(so0, two, vsthr, vssh, ks, SBL, E); \
            BD_TAP(-so0, two, vsthr, vssh, ks, SBL, E); \
            BD_TAP(so2, two, vsthr, vssh, ks, SBL, E); \
            BD_TAP(-so2, two, vsthr, vssh, ks, SBL, E); \
            BD_TAP(so1, one, vsthr, vssh, ks, SBL, E); \
            BD_TAP(-so1, one, vsthr, vssh, ks, SBL, E); \
            BD_TAP(so3, one, vsthr, vssh, ks, SBL, E); \
            BD_TAP(-so3, one, vsthr, vssh, ks, SBL, E); \
            __m512i adj = _mm512_add_epi16(_mm512_add_epi16(eight, s), \
                                           _mm512_srai_epi16(s, 15)); \
            __m512i val = _mm512_add_epi16(px, \
                                           _mm512_srai_epi16(adj, 4)); \
            val = _mm512_min_epi16(_mm512_max_epi16(val, mn), mx); \
            pel *d = dst + (int64_t)i * dstride + x; \
            BD_STORE(d, m, val); \
        }
        if (!edged && !pri_on && !sblend) {
            BD_ROWS(0, 0, 0, 0)          /* sec-only uniform interior */
        } else if (!edged && pri_on && !pblend && !sblend) {
            BD_ROWS(1, 0, 0, 0)          /* fully-active interior */
        } else if (edged) {
            BD_ROWS(1, 1, 1, 1)
        } else {
            BD_ROWS(pri_on, 1, 1, 0)
        }
#undef BD_TAP
#undef BD_STORE
#undef BD_ROWS
    }
}

/* Secondary-only band filter: when a whole row of CDEF positions
 * shares pri==0 and one sec strength (the dominant case — pri is
 * content-gated by the direction variance and often 0), the cross-
 * shaped sec taps ((0,±1)w2 (0,±2)w1 (±1,0)w2 (±2,0)w1; dir terms
 * collapse since pdir==0) are uniform across the band.  Filter 32 px
 * per vector straight from the padded stripe, writing the live plane
 * through a per-pixel mask built from the skip map.  This amortizes
 * the per-block window pack + prologue that dominates CDEF on
 * all-filtered frames.  Bit-exact: identical int16 arithmetic to
 * cdef_filter_rows_avx2 with edged=1 (sentinel-masked mx). */
static void cdef_band_sec(pel *dst, int64_t dstride,
                          const int16_t *sp, int64_t sst,
                          int n_px, int h, int sec, int sec_shift,
                          const uint8_t *px_on, int rows_edged) {
    const __m512i vlarge = _mm512_set1_epi16(CDEF_VERY_LARGE);
    const __m512i vthr = _mm512_set1_epi16((short)sec);
    const __m128i vsh = _mm_cvtsi32_si128(sec_shift);
    const __m512i vw2 = _mm512_set1_epi16(2);
    const __m512i vw1 = _mm512_set1_epi16(1);
    const __m512i eight = _mm512_set1_epi16(8);
    for (int x = 0; x < n_px; x += 32) {
        __m256i onb = _mm256_loadu_si256((const __m256i *)(px_on + x));
        __mmask32 m = _mm256_test_epi8_mask(onb, onb);
        if (x + 32 > n_px)
            m &= (n_px - x >= 32) ? ~0u : ((1u << (n_px - x)) - 1);
        if (!m) continue;
        /* sentinels (CDEF_VERY_LARGE) only appear in the 2 pad
           columns each side and in rows outside the frame; interior
           vectors skip the per-tap sentinel masking entirely */
        int edged = rows_edged || x == 0 || x + 35 >= n_px + 2;
#define CB_ROWS(E) \
        for (int i = 0; i < h; i++) { \
            const int16_t *row = sp + (int64_t)(i + 2) * sst + x + 2; \
            __m512i px = _mm512_loadu_si512((const void *)row); \
            __m512i s = _mm512_setzero_si512(), mx = px, mn = px; \
            CBTAP(1, vw2, E); CBTAP(-1, vw2, E); \
            CBTAP(2, vw1, E); CBTAP(-2, vw1, E); \
            CBTAP(sst, vw2, E); CBTAP(-sst, vw2, E); \
            CBTAP(2 * sst, vw1, E); CBTAP(-2 * sst, vw1, E); \
            __m512i adj = _mm512_add_epi16(_mm512_add_epi16(eight, s), \
                                           _mm512_srai_epi16(s, 15)); \
            __m512i val = _mm512_add_epi16(px, \
                                           _mm512_srai_epi16(adj, 4)); \
            val = _mm512_min_epi16(_mm512_max_epi16(val, mn), mx); \
            pel *d = dst + (int64_t)i * dstride + x; \
            CB_STORE(d, m, val); \
        }
#if PEL_BITS == 8
#define CB_STORE(d, m, val) \
            _mm256_mask_storeu_epi8(d, m, _mm512_cvtusepi16_epi8(val))
#else
#define CB_STORE(d, m, val) _mm512_mask_storeu_epi16(d, m, val)
#endif
#define CBTAP(off, vw, E) \
            s = cdef_tap512(_mm512_loadu_si512((const void *)(row + (off))), \
                            px, vthr, vsh, vw, s, &mx, &mn, vlarge, E)
        if (edged) {
            CB_ROWS(1)
        } else {
            CB_ROWS(0)
        }
#undef CBTAP
#undef CB_STORE
#undef CB_ROWS
    }
}
#endif

static void cdef_filter_block(pel *dst, int dstride,
                              const int16_t *src, int sstride,
                              int x, int y, int w, int h, int pri, int sec,
                              int damping, int dir, int bd, int edged) {
    int pt[2];
    if (((pri >> (bd - 8)) & 1) == 0) { pt[0] = 4; pt[1] = 2; }
    else { pt[0] = 3; pt[1] = 3; }
    static const int st[2] = {2, 1};
    int pri_shift = cdef_shift_for(pri, damping);
    int sec_shift = cdef_shift_for(sec, damping);
#ifdef __AVX2__
    if ((w == 8 || w == 4) && (h & 1) == 0) {
        if (edged)
            cdef_filter_rows_avx2(dst, dstride, src, sstride, x, y, w, h,
                                  pri, sec, pt[0], pt[1], pri_shift,
                                  sec_shift, dir, 1);
        else
            cdef_filter_rows_avx2(dst, dstride, src, sstride, x, y, w, h,
                                  pri, sec, pt[0], pt[1], pri_shift,
                                  sec_shift, dir, 0);
        return;
    }
#endif
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
    int32_t out[8 * 8];
    for (int i = 0; i < h; i++) {
        const int16_t *row = src + (int64_t)(y + i + 2) * sstride + x + 2;
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
            dst[(y + i) * dstride + (x + j)] = (pel)out[i * w + j];
}

static void av1_cdef(const ReconParams *rp, const TileOut *o,
                     pel *planes[3], const int pw[3], const int ph[3]) {
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
    int n_pl = rp->num_planes;

    /* Full-width padded pre-CDEF stripes, one per plane: stripe row i
       holds plane row yy-2+i (yy = this block row's top) as it was
       BEFORE this block row was filtered, at column offset +2, with 2
       CDEF_VERY_LARGE pad columns each side and VERY_LARGE rows
       outside the frame.  In-place filtering then needs no per-block
       halo assembly and no left/above bookkeeping at all: kernels
       read the stripe (taps reach dy/dx in [-2,+2], all inside it)
       and write the live plane; the next row's two `above` rows are
       this stripe's bottom two section rows, shifted down before the
       refill.  Refill traffic is (bh+4)/bh of each plane per frame —
       linear memcpys instead of ~33k strided per-block snapshots. */
    static int16_t *stripe[3];
    static size_t stripe_cap[3];
    int sst[3];
    int bw[3], bh[3];
    bw[0] = bh[0] = 8;
    bw[1] = bw[2] = 8 >> rp->ssx;
    bh[1] = bh[2] = 8 >> rp->ssy;
    for (int p = 0; p < n_pl; p++) {
        sst[p] = pw[p] + 4;
        /* +40 slack: the 8-lane AVX2 row loads of a 4-wide block read
           up to 4 int16 past the window at the right frame edge, and
           the 32-lane band filter's last vector reads up to 28 past
           the final stripe row */
        size_t need = (size_t)sst[p] * (bh[p] + 4) + 40;
        if (stripe_cap[p] < need) {
            free(stripe[p]);
            stripe[p] = malloc(sizeof(int16_t) * need);
            stripe_cap[p] = stripe[p] ? need : 0;
        }
        if (!stripe[p]) return;
        for (size_t i = 0; i < need; i++)
            stripe[p][i] = CDEF_VERY_LARGE;
    }
    /* uv-paired filter staging: rotating buffers + a TWO-deep filter
       queue, so each filter call reads a window staged two positions
       earlier — its 512-bit tap loads then never hit the store buffer.
       (Depth 1 was enough when only chroma queued; on all-pri frames
       the luma-512 and uv paths interleave in the same queue, putting
       the filter right behind its own staging stores — measured 334
       vs ~150 cyc/call at 1080p intra.) */
    int16_t tmp2[4][14 * CDEF_TSTRIDE];
    typedef struct {
        pel *du, *dv;
        const int16_t *buf;
        int ds, h, pri, sec, pt0, pt1, psh, ssh, pdir, edged;
    } UvqEnt;
    UvqEnt uvq2[2];
    int uvq_n = 0;
    int uvflip = 0;

    /* per-row position classification, shared by every pass below
       (band detect, dir pre-pass, filter loop): pos_idx[pc] is the
       64x64-unit cdef_idx of 8x8-position pc, or -1 for skipped.
       Static: 8192 positions covers 32768-px-wide video. */
    static int16_t pos_idx[8192];
    int n_pos = (mi_cols + 1) / 2;
    if (n_pos > 8192) return;
#if defined(__AVX512BW__) && defined(__AVX512VL__)
    static uint8_t *pxon;
    static size_t pxon_cap;
    if (pxon_cap < (size_t)pw[0] + 64) {
        free(pxon);
        pxon = malloc((size_t)pw[0] + 64);
        pxon_cap = pxon ? (size_t)pw[0] + 64 : 0;
    }
    int use_band = pxon != NULL;
    /* dir-banded chroma: per-lane parameter rows (strengths/shifts/
       weights per pixel at chroma resolution) + per-pixel dir bucket;
       the whole chroma filter then runs as <=8 masked band passes per
       block row instead of per-position staged calls */
    static int16_t *cprm;            /* 5 rows of pw[1]+64 int16 */
    static uint8_t *cdirb, *con, *cmask;
    static size_t cprm_cap;
    int use_dirband = 0;
    if (n_pl == 3) {
        size_t need = (size_t)pw[1] + 64;
        if (cprm_cap < need) {
            free(cprm); free(cdirb); free(con); free(cmask);
            cprm = malloc(sizeof(int16_t) * 5 * need);
            cdirb = malloc(need);
            con = malloc(need);
            cmask = malloc(need);
            cprm_cap = (cprm && cdirb && con && cmask) ? need : 0;
        }
        use_dirband = cprm_cap >= need;
    }
    int16_t *r_pthr = cprm;
    int16_t *r_psh = cprm ? cprm + cprm_cap : NULL;
    int16_t *r_pw0 = cprm ? cprm + 2 * cprm_cap : NULL;
    int16_t *r_sthr = cprm ? cprm + 3 * cprm_cap : NULL;
    int16_t *r_ssh = cprm ? cprm + 4 * cprm_cap : NULL;
    /* dir-banded LUMA: the same masked full-width machinery at luma
       resolution.  Per-lane thresholds carry the per-position var-
       adjusted pri, so the whole luma filter becomes <=8 band passes
       per block row straight from the stripe — replacing the per-
       position stage(12 rows)+queue+filter path (~385 cyc/block on
       all-pri intra frames; the band pass shares tap loads across
       every position of a direction bucket and needs no staging). */
    static int16_t *yprm;
    static uint8_t *ydirb, *ycon, *ymask;
    static size_t yprm_cap;
    int use_dirband_y = 0;
    {
        size_t need = (size_t)pw[0] + 64;
        if (yprm_cap < need) {
            free(yprm); free(ydirb); free(ycon); free(ymask);
            yprm = malloc(sizeof(int16_t) * 5 * need);
            ydirb = malloc(need);
            ycon = malloc(need);
            ymask = malloc(need);
            yprm_cap = (yprm && ydirb && ycon && ymask) ? need : 0;
        }
        use_dirband_y = yprm_cap >= need;
    }
    int16_t *y_pthr = yprm;
    int16_t *y_psh = yprm ? yprm + yprm_cap : NULL;
    int16_t *y_pw0 = yprm ? yprm + 2 * yprm_cap : NULL;
    int16_t *y_sthr = yprm ? yprm + 3 * yprm_cap : NULL;
    int16_t *y_ssh = yprm ? yprm + 4 * yprm_cap : NULL;
#endif

    const int8_t *skip = o->skip;
    int stripe_filled[3] = {0, 0, 0};
    for (int r = 0; r < mi_rows; r += 2) {
        int y = r * 4;
        /* lazy refill: a block row with no filterable position (all
           skip, cdef_idx -1, or zero strengths) needs no stripe at
           all, and its live rows stay pre-CDEF — so a later row can
           rebuild its `above` context straight from the plane */
        int row_any_y = 0, row_any_uv = 0;
        int band_y = 0, band_uv = 0;
        int y_sec_u = -1, uv_sec_u = -1;
        int row_any_pri = 0;
        int uv_uni = 1, uv_u_pri = -1, uv_u_sec = -1;
        const int8_t *crow = o->cdef_idx + (r / 16) * ucols;
        uint64_t cl0 = cdef_profile ? __rdtsc() : 0;
        {
            /* classification, two cheap passes: (1) vectorized per-
               position skip-detect into posskip[], (2) unit-level
               (64x64, at most 8 positions each) strength flags +
               band-uniformity + pos_idx run fills — every position
               of a unit shares its cdef_idx, so per-position strength
               lookups were 8x redundant */
            int r2c = r + 1 < mi_rows ? r + 1 : mi_rows - 1;
            const int8_t *sk0 = skip + (int64_t)r * mi_cols;
            const int8_t *sk1 = skip + (int64_t)r2c * mi_cols;
            static uint8_t posskip[8192];
            int pc0 = 0;
#if defined(__AVX512BW__) && defined(__AVX512VL__)
            for (; pc0 + 32 <= n_pos && 2 * pc0 + 64 <= mi_cols;
                 pc0 += 32) {
                __m512i a = _mm512_loadu_si512(
                    (const void *)(sk0 + 2 * pc0));
                __m512i b = _mm512_loadu_si512(
                    (const void *)(sk1 + 2 * pc0));
                __m512i t = _mm512_and_si512(a, b);
                __m512i u2 = _mm512_and_si512(t, _mm512_srli_epi16(t, 8));
                _mm256_storeu_si256((__m256i *)(posskip + pc0),
                                    _mm512_cvtepi16_epi8(u2));
            }
#endif
            for (; pc0 < n_pos; pc0++) {
                int c = pc0 * 2;
                int c2 = c + 1 < mi_cols ? c + 1 : mi_cols - 1;
                posskip[pc0] = sk0[c] & sk0[c2] & sk1[c] & sk1[c2];
            }
            int y_ok = 1, uv_ok = 1, any_ys = 0, any_uvs = 0;
#if defined(__AVX512BW__) && defined(__AVX512VL__)
            int gwc = 8 >> rp->ssx;
            if (use_dirband)
                memset(con, 0, (size_t)pw[1] + 64);
#endif
            for (int u = 0; u < ucols; u++) {
                int p0 = u * 8;
                if (p0 >= n_pos) break;
                int pe = p0 + 8 < n_pos ? p0 + 8 : n_pos;
                int idx = crow[u];
                int any = 0;
                for (int pc = p0; pc < pe; pc++) any |= !posskip[pc];
                if (idx < 0 || !any) {
                    for (int pc = p0; pc < pe; pc++) pos_idx[pc] = -1;
                    continue;
                }
                for (int pc = p0; pc < pe; pc++)
                    pos_idx[pc] = posskip[pc] ? -1 : (int16_t)idx;
                int yp = rp->cdef_y_pri[idx], ys = rp->cdef_y_sec[idx];
                int up = rp->cdef_uv_pri[idx], us = rp->cdef_uv_sec[idx];
                if (yp | ys) row_any_y = 1;
                if (n_pl == 3 && (up | us)) row_any_uv = 1;
                if (yp | up) row_any_pri = 1;
#if defined(__AVX512BW__) && defined(__AVX512VL__)
                if (use_dirband && n_pl == 3 && (up | us)) {
                    int upri = up << coeff_shift;
                    int usec = us << coeff_shift;
                    if (uv_u_pri < 0) { uv_u_pri = upri; uv_u_sec = usec; }
                    else if (uv_u_pri != upri || uv_u_sec != usec)
                        uv_uni = 0;
                    int16_t w0v = ((up & 1) == 0) ? 4 : 3;
                    int16_t pshv =
                        (int16_t)cdef_shift_for(upri, damping - 1);
                    int16_t sshv =
                        (int16_t)cdef_shift_for(usec, damping - 1);
                    /* broadcast fills: the rows carry 64-byte slack,
                       so full-width stores at the last position are
                       safe; `con` is 1-per-px (memset per span) */
                    const __m128i bp = _mm_set1_epi16((short)upri);
                    const __m128i bh = _mm_set1_epi16(pshv);
                    const __m128i bw = _mm_set1_epi16(w0v);
                    const __m128i bs = _mm_set1_epi16((short)usec);
                    const __m128i bh2 = _mm_set1_epi16(sshv);
                    for (int pc = p0; pc < pe; pc++) {
                        if (pos_idx[pc] < 0) continue;
                        int x0 = pc * gwc;
                        int wv = pw[1] - x0 < gwc ? pw[1] - x0 : gwc;
                        _mm_storeu_si128((__m128i *)(r_pthr + x0), bp);
                        _mm_storeu_si128((__m128i *)(r_psh + x0), bh);
                        _mm_storeu_si128((__m128i *)(r_pw0 + x0), bw);
                        _mm_storeu_si128((__m128i *)(r_sthr + x0), bs);
                        _mm_storeu_si128((__m128i *)(r_ssh + x0), bh2);
                        memset(con + x0, 1, (size_t)wv);
                    }
                }
#endif
                if (yp == 0 && ys) {
                    int s = ys << coeff_shift;
                    if (y_sec_u < 0) y_sec_u = s;
                    else if (y_sec_u != s) y_ok = 0;
                    any_ys = 1;
                }
                if (n_pl == 3 && up == 0 && us) {
                    int s = us << coeff_shift;
                    if (uv_sec_u < 0) uv_sec_u = s;
                    else if (uv_sec_u != s) uv_ok = 0;
                    any_uvs = 1;
                }
            }
            band_y = any_ys && y_ok;
            band_uv = any_uvs && uv_ok;
        }
        if (__builtin_expect(cdef_profile, 0))
            cdef_stat[16] += __rdtsc() - cl0;
#if defined(__AVX512BW__) && defined(__AVX512VL__)
        if (!use_band) band_y = band_uv = 0;
        if (use_dirband) band_uv = 0;   /* dir-band covers all chroma */
        /* band_y stays on: uniform sec-only rows skip the walk's
           per-position lane fill entirely (done_y) and run as one
           broadcast band pass; dir-banded luma covers the rest
           (pri>0 / mixed rows) via the walk fill */
#else
        /* no band kernel in this build: the filter loop covers all */
        band_y = band_uv = 0;
        (void)y_sec_u; (void)uv_sec_u;
#endif
        if (!row_any_y && !row_any_uv) {
            stripe_filled[0] = stripe_filled[1] = stripe_filled[2] = 0;
            continue;
        }
        /* refill the stripes for this block row: rows 0-1 (the pre-CDEF
           `above` context) shift down from the previous stripe's bottom
           section rows — or, when the previous row was unfiltered (its
           stripe skipped), copy from the still-pre-CDEF live plane;
           rows 2..bh+3 copy straight from the live plane (pre-CDEF
           here by construction — this row and everything below it is
           not yet filtered).  pel (uint16 < 0x4000) to int16 is a
           bit-identical memcpy. */
        uint64_t rf0 = __rdtsc();
        for (int p = 0; p < n_pl; p++) {
            if (!(p == 0 ? row_any_y : row_any_uv)) {
                stripe_filled[p] = 0;
                continue;
            }
            int h = bh[p], st = sst[p];
            int yy = y >> (p ? rp->ssy : 0);
            int16_t *sp = stripe[p];
            if (r > 0 && stripe_filled[p])
                memcpy(sp, sp + (size_t)h * st,
                       sizeof(int16_t) * (size_t)st * 2);
            else
                for (int i = 0; i < 2; i++) {
                    int py_ = yy - 2 + i;
                    int16_t *row = sp + (size_t)i * st;
                    if (py_ >= 0 && py_ < ph[p])
                        cdef_pel_to_i16(row + 2,
                                        planes[p]
                                            + (int64_t)py_ * pw[p],
                                        pw[p]);
                    else
                        for (int j = 0; j < st; j++)
                            row[j] = CDEF_VERY_LARGE;
                }
            for (int i = 0; i < h + 2; i++) {
                int16_t *row = sp + (size_t)(i + 2) * st;
                int py_ = yy + i;
                if (py_ < ph[p])
                    cdef_pel_to_i16(row + 2,
                                    planes[p] + (int64_t)py_ * pw[p],
                                    pw[p]);
                else
                    for (int j = 0; j < st; j++)
                        row[j] = CDEF_VERY_LARGE;
            }
            stripe_filled[p] = 1;
        }
        cdef_stat[5] += __rdtsc() - rf0;
        /* direction pre-pass, row-sequential: the strided per-unit
           8x8 luma reads inside the filter loop miss DRAM on every
           row (~200 cyc/unit at 4K); walking the positions in x order
           streams the same 8 plane rows once */
        static int8_t *dirrow;
        static int32_t *varrow;
        static size_t dircap;
        {
            size_t nu = (size_t)((mi_cols + 1) / 2);
            if (dircap < nu) {
                free(dirrow); free(varrow);
                dirrow = malloc(nu);
                varrow = malloc(nu * sizeof(int32_t));
                dircap = (dirrow && varrow) ? nu : 0;
            }
            if (dircap >= nu && row_any_pri) {
                const pel *dbase = planes[0] + (int64_t)y * pw[0];
                uint64_t dc0 = cdef_profile ? __rdtsc() : 0;
                for (int u = 0; u < ucols; u++) {
                    int p0 = u * 8;
                    if (p0 >= n_pos) break;
                    int idx = crow[u];
                    if (idx < 0 || !(rp->cdef_y_pri[idx]
                                     || rp->cdef_uv_pri[idx]))
                        continue;
                    int pe = p0 + 8 < n_pos ? p0 + 8 : n_pos;
                    for (int pc = p0; pc < pe; pc++) {
                        /* rotating row-prefetch keeps the 8 source
                           rows ~8 units ahead of the searches */
                        __builtin_prefetch(dbase
                                           + (pc & 7) * (int64_t)pw[0]
                                           + pc * 8 + 64);
                        if (pos_idx[pc] < 0) continue;
                        int d_, v_;
#if defined(__AVX512BW__) && defined(__AVX512VL__)
                        /* adjacent valid positions share one paired
                           search (both 8x8 windows in one register
                           pass) */
                        if (pc + 1 < pe && pos_idx[pc + 1] >= 0) {
                            int d2_, v2_;
                            cdef_find_dir_pair(dbase + pc * 8, pw[0],
                                               coeff_shift, &d_, &v_,
                                               &d2_, &v2_);
                            dirrow[pc] = (int8_t)d_;
                            varrow[pc] = v_;
                            dirrow[pc + 1] = (int8_t)d2_;
                            varrow[pc + 1] = v2_;
                            cdef_stat[11] += 2 * (cdef_profile != 0);
                            pc++;
                            continue;
                        }
#endif
                        cdef_find_dir(dbase + pc * 8,
                                      pw[0], coeff_shift, &d_, &v_);
                        dirrow[pc] = (int8_t)d_;
                        varrow[pc] = v_;
                        cdef_stat[11] += cdef_profile != 0;
                    }
                }
                if (__builtin_expect(cdef_profile, 0))
                    cdef_stat[10] += __rdtsc() - dc0;
            }
        }
#if defined(__AVX512BW__) && defined(__AVX512VL__)
        /* chroma dir buckets: pdir = Cdef_Uv_Dir[luma dir] when the
           unit has a uv primary strength, else 0 (spec: sec-only taps
           use direction 0) */
        unsigned dir_mask = 0;
        if (use_dirband && row_any_uv) {
            int gwc2 = 8 >> rp->ssx;
            const int8_t *uvmap = CDEF_UV_DIR[rp->ssx][rp->ssy];
            int have_dirs = dircap >= (size_t)((mi_cols + 1) / 2);
            for (int pc = 0; pc < n_pos; pc++) {
                int idx = pos_idx[pc];
                int x0 = pc * gwc2;
                if (idx < 0 || !con[x0]) continue;
                int d_ = 0;
                if (rp->cdef_uv_pri[idx]) {
                    int ld = have_dirs ? dirrow[pc] : 0;
                    if (!have_dirs) {
                        int v_;
                        cdef_find_dir(planes[0] + (int64_t)y * pw[0]
                                          + pc * 8,
                                      pw[0], coeff_shift, &ld, &v_);
                    }
                    d_ = uvmap[ld];
                }
                int wv = pw[1] - x0 < gwc2 ? pw[1] - x0 : gwc2;
                for (int k = 0; k < wv; k++) cdirb[x0 + k] = (uint8_t)d_;
                dir_mask |= 1u << d_;
            }
        }
#endif
        /* unit-outer filter walk: strengths, tap weights and damping
           shifts depend only on the 64x64 unit's cdef_idx, so all
           parameter setup and the done_y/done_uv gates hoist out of
           the position loop; fully-handled units skip wholesale */
#if defined(__AVX512BW__) && defined(__AVX512VL__)
        unsigned ydir_mask = 0;
        int y_uni = 1, y_u_pri = -1, y_u_sec = -1;
        if (use_dirband_y && row_any_y)
            memset(ycon, 0, (size_t)pw[0] + 64);
#endif
        uint64_t fw0 = cdef_profile ? __rdtsc() : 0;
        for (int u = 0; u < ucols; u++) {
            int p0u = u * 8;
            if (p0u >= n_pos) break;
            int idx = crow[u];
            if (idx < 0) continue;
            int done_y = band_y && rp->cdef_y_pri[idx] == 0;
            int done_uv = band_uv && rp->cdef_uv_pri[idx] == 0;
#if defined(__AVX512BW__) && defined(__AVX512VL__)
            if (use_dirband) done_uv = 1;
#endif
            if (done_y && (n_pl == 1 || done_uv))
                continue;
            int u_pri = rp->cdef_uv_pri[idx] << coeff_shift;
            int u_sec = rp->cdef_uv_sec[idx] << coeff_shift;
            int u_pt0, u_pt1;
            if (((u_pri >> coeff_shift) & 1) == 0) {
                u_pt0 = 4; u_pt1 = 2;
            } else {
                u_pt0 = 3; u_pt1 = 3;
            }
            int u_psh = cdef_shift_for(u_pri, damping - 1);
            int u_ssh = cdef_shift_for(u_sec, damping - 1);
            int peu = p0u + 8 < n_pos ? p0u + 8 : n_pos;
            for (int pc = p0u; pc < peu; pc++) {
                int c = pc * 2;
                int x = c * 4;
                if (pos_idx[pc] < 0) continue;
                {
                int dir = 0, var = 0;
                cdef_stat[4]++;
                if (rp->cdef_y_pri[idx] || rp->cdef_uv_pri[idx]) {
                    if (dircap >= (size_t)((mi_cols + 1) / 2)) {
                        dir = dirrow[c >> 1];
                        var = varrow[c >> 1];
                    } else
                        /* alloc-failure fallback: search in place
                           (still pre-CDEF: band runs after this) */
                        cdef_find_dir(planes[0] + (int64_t)y * pw[0]
                                          + x,
                                      pw[0], coeff_shift, &dir, &var);
                }
#if defined(__AVX512BW__) && defined(__AVX512VL__)
                /* U+V-paired chroma (4-wide blocks, ssx=1): one pass
                   filters both planes with full 512-bit lanes */
                int uv_paired = 0;
                if (n_pl == 3 && rp->ssx == 1 && !done_uv
                    && !use_dirband) {
                    int pri = u_pri, sec = u_sec;
                    uv_paired = 1;
                    if (pri | sec) {
                        int px = x >> 1, py2 = y >> rp->ssy;
                        int h = 8 >> rp->ssy;
                        int pdir = pri ? CDEF_UV_DIR[1][rp->ssy][dir]
                                       : 0;
                        cdef_stat[1] += 2;
                        int interior = px >= 2 && px + 6 <= pw[1]
                                       && py2 >= 2
                                       && py2 + h + 2 <= ph[1];
                        /* stage: interleave [U window | V window] rows
                           from the stripes (halo and edge padding
                           already resolved there) */
                        int16_t *tb = tmp2[uvflip];
                        uvflip = (uvflip + 1) & 3;
                        for (int i = 0; i < h + 4; i++) {
                            const int16_t *su =
                                stripe[1] + (size_t)i * sst[1] + px;
                            const int16_t *sv =
                                stripe[2] + (size_t)i * sst[2] + px;
                            _mm256_storeu_si256(
                                (__m256i *)(tb + i * CDEF_TSTRIDE),
                                _mm256_inserti128_si256(
                                    _mm256_castsi128_si256(
                                        _mm_loadu_si128(
                                            (const __m128i *)su)),
                                    _mm_loadu_si128((const __m128i *)sv),
                                    1));
                        }
                        /* filter the oldest staged position (its
                           stores are long retired), then queue ours */
                        if (uvq_n == 2) {
                            UvqEnt *q = &uvq2[0];
                            uint64_t pc0 = cdef_profile ? __rdtsc() : 0;
                            cdef_filter_uv_avx512(
                                q->du, q->dv, q->ds, q->buf, q->h,
                                q->pri, q->sec, q->pt0, q->pt1,
                                q->psh, q->ssh, q->pdir, q->edged);
                            if (__builtin_expect(cdef_profile, 0)) {
                                cdef_stat[8] += __rdtsc() - pc0;
                                cdef_stat[9]++;
                            }
                            uvq2[0] = uvq2[1];
                            uvq_n = 1;
                        }
                        int64_t doff = (int64_t)py2 * pw[1] + px;
                        UvqEnt *e = &uvq2[uvq_n++];
                        e->du = planes[1] + doff;
                        e->dv = planes[2] + doff;
                        e->buf = tb;
                        e->ds = pw[1];
                        e->h = h;
                        e->pri = pri; e->sec = sec;
                        e->pt0 = u_pt0; e->pt1 = u_pt1;
                        e->psh = u_psh; e->ssh = u_ssh;
                        e->pdir = pdir;
                        e->edged = !interior;
                    }
                }
#endif
                for (int plane = 0; plane < n_pl; plane++) {
                    int pri, sec, pdamp, px, py2, w, h, pdir;
#if defined(__AVX512BW__) && defined(__AVX512VL__)
                    if (plane && uv_paired) break;
#endif
#if defined(__AVX512BW__) && defined(__AVX512VL__)
                    if (plane > 0 && use_dirband) continue;
#endif
                    if (plane == 0 ? done_y : done_uv) continue;
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
                        pdir = pri ? CDEF_UV_DIR[rp->ssx][rp->ssy][dir]
                                   : 0;
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
                    if (adj_pri == 0 && sec == 0)
                        continue;  /* zero taps: identity */
                    cdef_stat[plane ? 1 : 0]++;
                    cdef_stat[2] += pri != 0;
                    cdef_stat[3] += sec != 0;
#if defined(__AVX512BW__) && defined(__AVX512VL__)
                    if (plane == 0 && use_dirband_y) {
                        /* fill this position's 8 luma lanes; the
                           masked band passes after the walk do the
                           actual filtering */
                        int wv = pw[0] - px < 8 ? pw[0] - px : 8;
                        int16_t w0v =
                            ((adj_pri >> coeff_shift) & 1) == 0 ? 4 : 3;
                        _mm_storeu_si128(
                            (__m128i *)(y_pthr + px),
                            _mm_set1_epi16((short)adj_pri));
                        _mm_storeu_si128(
                            (__m128i *)(y_psh + px),
                            _mm_set1_epi16((short)cdef_shift_for(
                                adj_pri, pdamp)));
                        _mm_storeu_si128((__m128i *)(y_pw0 + px),
                                         _mm_set1_epi16(w0v));
                        _mm_storeu_si128(
                            (__m128i *)(y_sthr + px),
                            _mm_set1_epi16((short)sec));
                        _mm_storeu_si128(
                            (__m128i *)(y_ssh + px),
                            _mm_set1_epi16((short)cdef_shift_for(
                                sec, pdamp)));
                        memset(ydirb + px, pdir, (size_t)wv);
                        memset(ycon + px, 1, (size_t)wv);
                        ydir_mask |= 1u << pdir;
                        if (y_u_pri < 0) {
                            y_u_pri = adj_pri; y_u_sec = sec;
                        } else if (y_u_pri != adj_pri
                                   || y_u_sec != sec)
                            y_uni = 0;
                        continue;
                    }
#endif
                    uint64_t fb0 =
                        cdef_profile ? __rdtsc() : 0;
                    int interior = px >= 2 && px + w + 2 <= pw[plane]
                                   && py2 >= 2
                                   && py2 + h + 2 <= ph[plane];
#if defined(__AVX512BW__) && defined(__AVX512VL__)
                    if (plane == 0 && w == 8 && h == 8) {
                        /* luma 8x8 as two 4-wide halves through the
                           512-bit pair kernel: tmp rows hold
                           [left window(8) | right window(8)], giving
                           2 output rows x 8 cols per 32-lane pass —
                           2x the per-op throughput of the AVX2 path */
                        int16_t *tb = tmp2[uvflip];
                        uvflip = (uvflip + 1) & 3;
                        for (int i = 0; i < 12; i++) {
                            const int16_t *sy = stripe[0]
                                + (size_t)i * sst[0] + px;
                            _mm256_storeu_si256(
                                (__m256i *)(tb + i * CDEF_TSTRIDE),
                                _mm256_inserti128_si256(
                                    _mm256_castsi128_si256(
                                        _mm_loadu_si128(
                                            (const __m128i *)sy)),
                                    _mm_loadu_si128(
                                        (const __m128i *)(sy + 4)),
                                    1));
                        }
                        if (uvq_n == 2) {
                            UvqEnt *q = &uvq2[0];
                            cdef_filter_uv_avx512(
                                q->du, q->dv, q->ds, q->buf, q->h,
                                q->pri, q->sec, q->pt0, q->pt1,
                                q->psh, q->ssh, q->pdir, q->edged);
                            uvq2[0] = uvq2[1];
                            uvq_n = 1;
                        }
                        int64_t doff = (int64_t)py2 * pw[0] + px;
                        UvqEnt *e = &uvq2[uvq_n++];
                        e->du = planes[0] + doff;
                        e->dv = planes[0] + doff + 4;
                        e->buf = tb;
                        e->ds = pw[0];
                        e->h = 8;
                        e->pri = adj_pri;
                        e->sec = sec;
                        if (((adj_pri >> coeff_shift) & 1) == 0) {
                            e->pt0 = 4; e->pt1 = 2;
                        } else {
                            e->pt0 = 3; e->pt1 = 3;
                        }
                        e->psh = cdef_shift_for(adj_pri, pdamp);
                        e->ssh = cdef_shift_for(sec, pdamp);
                        e->pdir = pdir;
                        e->edged = !interior;
                        if (__builtin_expect(cdef_profile, 0))
                            if (__builtin_expect(cdef_profile, 0))
                        cdef_stat[12] += __rdtsc() - fb0;
                        continue;
                    }
#endif
                    /* read the padded stripe window in place, write at
                       the block's plane position */
                    cdef_filter_block(
                        planes[plane] + (int64_t)py2 * pw[plane] + px,
                        pw[plane], stripe[plane] + px, sst[plane],
                        0, 0, w, h,
                        adj_pri, sec, pdamp, pdir, bd, !interior);
                    if (__builtin_expect(cdef_profile, 0))
                        cdef_stat[12] += __rdtsc() - fb0;
                }
                }
            }
        }
        if (__builtin_expect(cdef_profile, 0))
            cdef_stat[17] += __rdtsc() - fw0;
        /* flush the queued uv filters before the stripes are reused */
#if defined(__AVX512BW__) && defined(__AVX512VL__)
        for (int qi = 0; qi < uvq_n; qi++) {
            UvqEnt *q = &uvq2[qi];
            uint64_t pc0 = cdef_profile ? __rdtsc() : 0;
            cdef_filter_uv_avx512(q->du, q->dv, q->ds, q->buf,
                                  q->h, q->pri, q->sec, q->pt0,
                                  q->pt1, q->psh, q->ssh, q->pdir,
                                  q->edged);
            if (__builtin_expect(cdef_profile, 0)) {
                cdef_stat[8] += __rdtsc() - pc0;
                cdef_stat[9]++;
            }
        }
        uvq_n = 0;
#endif
#if defined(__AVX512BW__) && defined(__AVX512VL__)
        /* dir-banded luma: one masked full-width pass per direction
           bucket, straight from the stripe (reads pre-CDEF stripe
           rows, writes the live plane — same ordering contract as the
           per-position path) */
        if (use_dirband_y && ydir_mask) {
            uint64_t yb0 = cdef_profile ? __rdtsc() : 0;
            int nyb = 0;
            for (int d_ = 0; d_ < 8; d_++) {
                if (!(ydir_mask & (1u << d_))) continue;
                int npx = pw[0];
                for (int xk = 0; xk + 64 <= npx + 64; xk += 64) {
                    __m512i ob = _mm512_loadu_si512(
                        (const void *)(ycon + xk));
                    __m512i db = _mm512_loadu_si512(
                        (const void *)(ydirb + xk));
                    __mmask64 mm = _mm512_test_epi8_mask(ob, ob)
                        & _mm512_cmpeq_epi8_mask(
                              db, _mm512_set1_epi8((char)d_));
                    _mm512_storeu_si512(
                        (void *)(ymask + xk),
                        _mm512_maskz_mov_epi8(mm,
                                              _mm512_set1_epi8(1)));
                }
                if (y_uni && y_u_pri >= 0) {
                    int16_t y5[5];
                    y5[0] = (int16_t)y_u_pri;
                    y5[1] = (int16_t)cdef_shift_for(y_u_pri, damping);
                    y5[2] = ((y_u_pri >> coeff_shift) & 1) == 0 ? 4
                                                                : 3;
                    y5[3] = (int16_t)y_u_sec;
                    y5[4] = (int16_t)cdef_shift_for(y_u_sec, damping);
                    cdef_band_dirp(planes[0] + (int64_t)y * pw[0],
                                   pw[0], stripe[0], sst[0], pw[0], 8,
                                   d_, ymask, y5, NULL, NULL, NULL,
                                   NULL, y < 2 || y + 10 > ph[0]);
                } else
                    cdef_band_dirp(planes[0] + (int64_t)y * pw[0],
                                   pw[0], stripe[0], sst[0], pw[0], 8,
                                   d_, ymask, y_pthr, y_psh, y_pw0,
                                   y_sthr, y_ssh,
                                   y < 2 || y + 10 > ph[0]);
                nyb++;
            }
            if (__builtin_expect(cdef_profile, 0)) {
                cdef_stat[21] += __rdtsc() - yb0;
                cdef_stat[22] += nyb;
            }
        }
#endif
#if defined(__AVX512BW__) && defined(__AVX512VL__)
        /* sec-only bands run AFTER the per-position pass: the per-
           position dir search (pri positions) reads its own 8x8 from
           the live plane, which must still be pre-CDEF; band and
           per-position positions are disjoint and every filter reads
           the stripes, so ordering is otherwise free. */
        if (band_y || band_uv) {
            uint64_t bm0 = cdef_profile ? __rdtsc() : 0;
            if (band_y) {
                memset(pxon, 0, (size_t)pw[0] + 64);
                int nb = 0;
                for (int pc = 0; pc < n_pos; pc++) {
                    int idx = pos_idx[pc];
                    if (idx >= 0 && rp->cdef_y_pri[idx] == 0
                        && rp->cdef_y_sec[idx]) {
                        int x0 = pc * 8;
                        int wv = pw[0] - x0 < 8 ? pw[0] - x0 : 8;
                        if (wv > 0) memset(pxon + x0, 1, (size_t)wv);
                        nb++;
                    }
                }
                uint64_t bl0 = __rdtsc();
                cdef_band_sec(planes[0] + (int64_t)y * pw[0], pw[0],
                              stripe[0], sst[0], pw[0], 8, y_sec_u,
                              cdef_shift_for(y_sec_u, damping), pxon,
                              y < 2 || y + 10 > ph[0]);
                cdef_stat[13] += __rdtsc() - bl0;
                cdef_stat[0] += nb;
                cdef_stat[3] += nb;
                cdef_stat[6] += nb;
            }
            if (band_uv) {
                int gw = 8 >> rp->ssx, hh = 8 >> rp->ssy;
                int py2 = y >> rp->ssy;
                memset(pxon, 0, (size_t)pw[1] + 64);
                int nb = 0;
                for (int pc = 0; pc < n_pos; pc++) {
                    int idx = pos_idx[pc];
                    if (idx >= 0 && rp->cdef_uv_pri[idx] == 0
                        && rp->cdef_uv_sec[idx]) {
                        int x0 = pc * gw;
                        int wv = pw[1] - x0 < gw ? pw[1] - x0 : gw;
                        if (wv > 0) memset(pxon + x0, 1, (size_t)wv);
                        nb++;
                    }
                }
                int ssh = cdef_shift_for(uv_sec_u, damping - 1);
                uint64_t bc0 = __rdtsc();
                for (int p = 1; p < n_pl; p++)
                    cdef_band_sec(planes[p] + (int64_t)py2 * pw[p],
                                  pw[p], stripe[p], sst[p], pw[p], hh,
                                  uv_sec_u, ssh, pxon,
                                  py2 < 2 || py2 + hh + 2 > ph[p]);
                cdef_stat[14] += __rdtsc() - bc0;
                cdef_stat[1] += 2 * nb;
                cdef_stat[3] += 2 * nb;
                cdef_stat[7] += 2 * nb;
            }
            if (__builtin_expect(cdef_profile, 0))
                cdef_stat[18] += __rdtsc() - bm0;
        }
        /* dir-banded chroma: one masked full-width pass per direction
           bucket per plane, straight from the stripes */
        if (use_dirband && dir_mask) {
            int gw3 = 8 >> rp->ssx, hh3 = 8 >> rp->ssy;
            int py3 = y >> rp->ssy;
            uint64_t db0 = cdef_profile ? __rdtsc() : 0;
            int ndb = 0;
            for (int d_ = 0; d_ < 8; d_++) {
                if (!(dir_mask & (1u << d_))) continue;
                /* bucket mask: on & (dirb == d) */
                int npx = pw[1];
                int xk = 0;
                for (; xk + 64 <= npx + 64; xk += 64) {
                    __m512i ob = _mm512_loadu_si512(
                        (const void *)(con + xk));
                    __m512i db = _mm512_loadu_si512(
                        (const void *)(cdirb + xk));
                    __mmask64 mm = _mm512_test_epi8_mask(ob, ob)
                        & _mm512_cmpeq_epi8_mask(
                              db, _mm512_set1_epi8((char)d_));
                    _mm512_storeu_si512(
                        (void *)(cmask + xk),
                        _mm512_maskz_mov_epi8(mm,
                                              _mm512_set1_epi8(1)));
                }
                int16_t uv5[5];
                if (uv_uni && uv_u_pri >= 0) {
                    uv5[0] = (int16_t)uv_u_pri;
                    uv5[1] = (int16_t)cdef_shift_for(uv_u_pri,
                                                     damping - 1);
                    uv5[2] = ((uv_u_pri >> coeff_shift) & 1) == 0 ? 4
                                                                  : 3;
                    uv5[3] = (int16_t)uv_u_sec;
                    uv5[4] = (int16_t)cdef_shift_for(uv_u_sec,
                                                     damping - 1);
                }
                for (int p = 1; p < n_pl; p++) {
                    if (uv_uni && uv_u_pri >= 0)
                        cdef_band_dirp(planes[p]
                                           + (int64_t)py3 * pw[p],
                                       pw[p], stripe[p], sst[p],
                                       pw[p], hh3, d_, cmask, uv5,
                                       NULL, NULL, NULL, NULL,
                                       py3 < 2
                                           || py3 + hh3 + 2 > ph[p]);
                    else
                        cdef_band_dirp(planes[p]
                                           + (int64_t)py3 * pw[p],
                                       pw[p], stripe[p], sst[p],
                                       pw[p], hh3, d_, cmask, r_pthr,
                                       r_psh, r_pw0, r_sthr, r_ssh,
                                       py3 < 2
                                           || py3 + hh3 + 2 > ph[p]);
                    ndb++;
                }
            }
            if (__builtin_expect(cdef_profile, 0)) {
                cdef_stat[19] += __rdtsc() - db0;
                cdef_stat[20] += ndb;
            }
            (void)gw3;
        }
#endif
    }
}
