/* AV1 deblocking loop filter, C port of lf_ref.py (spec §7.14).
 * Header-only; included by av1_recon.c after the Recon definitions. */
#pragma once

#include <stdint.h>
#include <stdlib.h>

#define MAX_LOOP_FILTER 63

/* per-block filter level (spec get_filter_level; lf_ref._filter_levels):
 * inter blocks add their reference's ref_delta + the mode delta
 * (GLOBALMV family -> mode_deltas[0], other inter -> [1]) */
static int lf_level_for_blk(const ReconParams *rp, int plane, int pass,
                            const int32_t *b) {
    int base;
    if (plane == 0) base = rp->lf_level[pass];
    else if (plane == 1) base = rp->lf_level[2];
    else base = rp->lf_level[3];
    int lvl = base;
    if (rp->lf_delta_enabled) {
        int n_shift = base >> 5;
        if (b == NULL || !b[BLK_IS_INTER]) {
            lvl += rp->lf_ref_deltas[0] * (1 << n_shift);
        } else {
            int midx = (b[BLK_MODE] == 15 || b[BLK_MODE] == 23) ? 0 : 1;
            lvl += (rp->lf_ref_deltas[b[BLK_REF0]]
                    + rp->lf_mode_deltas[midx]) * (1 << n_shift);
        }
        if (lvl < 0) lvl = 0;
        if (lvl > MAX_LOOP_FILTER) lvl = MAX_LOOP_FILTER;
    }
    return lvl;
}

static void lf_limits(int lvl, int sharpness, int bd, int *limit,
                      int *blimit, int *thresh) {
    int shift = sharpness > 4 ? 2 : (sharpness > 0 ? 1 : 0);
    int lim;
    if (sharpness > 0) {
        lim = lvl >> shift;
        if (lim < 1) lim = 1;
        if (lim > 9 - sharpness) lim = 9 - sharpness;
    } else {
        lim = lvl < 1 ? 1 : lvl;
    }
    int scale = 1 << (bd - 8);
    *limit = lim * scale;
    *blimit = (2 * (lvl + 2) + lim) * scale;
    *thresh = (lvl >> 4) * scale;
}

static int iabs(int x) { return x < 0 ? -x : x; }

/* filter one line across an edge; buf[base + k*stride] is sample q_k,
   buf[base + (-1-k)*stride] is p_k */
static void lf_line(pel *buf, int64_t base, int64_t stride, int size,
                    int limit, int blimit, int thresh, int bd) {
    int F = 1 << (bd - 8);
#define P(k) buf[base + (int64_t)(-1 - (k)) * stride]
#define Q(k) buf[base + (int64_t)(k) * stride]
    int p0 = P(0), p1 = P(1);
    int q0 = Q(0), q1 = Q(1);
    int mask = iabs(p1 - p0) <= limit && iabs(q1 - q0) <= limit &&
               iabs(p0 - q0) * 2 + (iabs(p1 - q1) >> 1) <= blimit;
    int p2 = 0, p3 = 0, q2 = 0, q3 = 0;
    if (size >= 6) {
        p2 = P(2);
        q2 = Q(2);
        mask = mask && iabs(p2 - p1) <= limit && iabs(q2 - q1) <= limit;
    }
    if (size >= 8) {
        p3 = P(3);
        q3 = Q(3);
        mask = mask && iabs(p3 - p2) <= limit && iabs(q3 - q2) <= limit;
    }
    if (!mask) return;

    int flat = 0;
    if (size >= 6)
        flat = iabs(p1 - p0) <= F && iabs(q1 - q0) <= F &&
               iabs(p2 - p0) <= F && iabs(q2 - q0) <= F;
    if (size >= 8)
        flat = flat && iabs(p3 - p0) <= F && iabs(q3 - q0) <= F;

    if (size == 14 && flat) {
        int flat2 = iabs(P(4) - p0) <= F && iabs(Q(4) - q0) <= F &&
                    iabs(P(5) - p0) <= F && iabs(Q(5) - q0) <= F &&
                    iabs(P(6) - p0) <= F && iabs(Q(6) - q0) <= F;
        if (flat2) {
            int pv[7], qv[7];
            for (int k = 0; k < 7; k++) { pv[k] = P(k); qv[k] = Q(k); }
            int o[12];
            o[0] = (pv[6] * 7 + pv[5] * 2 + pv[4] * 2 + pv[3] + pv[2]
                    + pv[1] + pv[0] + qv[0] + 8) >> 4;                /* -6 */
            o[1] = (pv[6] * 5 + pv[5] * 2 + pv[4] * 2 + pv[3] * 2 + pv[2]
                    + pv[1] + pv[0] + qv[0] + qv[1] + 8) >> 4;        /* -5 */
            o[2] = (pv[6] * 4 + pv[5] + pv[4] * 2 + pv[3] * 2 + pv[2] * 2
                    + pv[1] + pv[0] + qv[0] + qv[1] + qv[2] + 8) >> 4;
            o[3] = (pv[6] * 3 + pv[5] + pv[4] + pv[3] * 2 + pv[2] * 2
                    + pv[1] * 2 + pv[0] + qv[0] + qv[1] + qv[2] + qv[3]
                    + 8) >> 4;
            o[4] = (pv[6] * 2 + pv[5] + pv[4] + pv[3] + pv[2] * 2
                    + pv[1] * 2 + pv[0] * 2 + qv[0] + qv[1] + qv[2] + qv[3]
                    + qv[4] + 8) >> 4;
            o[5] = (pv[6] + pv[5] + pv[4] + pv[3] + pv[2] + pv[1] * 2
                    + pv[0] * 2 + qv[0] * 2 + qv[1] + qv[2] + qv[3] + qv[4]
                    + qv[5] + 8) >> 4;                                /* -1 */
            o[6] = (pv[5] + pv[4] + pv[3] + pv[2] + pv[1] + pv[0] * 2
                    + qv[0] * 2 + qv[1] * 2 + qv[2] + qv[3] + qv[4] + qv[5]
                    + qv[6] + 8) >> 4;                                /* 0 */
            o[7] = (pv[4] + pv[3] + pv[2] + pv[1] + pv[0] + qv[0] * 2
                    + qv[1] * 2 + qv[2] * 2 + qv[3] + qv[4] + qv[5]
                    + qv[6] * 2 + 8) >> 4;
            o[8] = (pv[3] + pv[2] + pv[1] + pv[0] + qv[0] + qv[1] * 2
                    + qv[2] * 2 + qv[3] * 2 + qv[4] + qv[5] + qv[6] * 3
                    + 8) >> 4;
            o[9] = (pv[2] + pv[1] + pv[0] + qv[0] + qv[1] + qv[2] * 2
                    + qv[3] * 2 + qv[4] * 2 + qv[5] + qv[6] * 4 + 8) >> 4;
            o[10] = (pv[1] + pv[0] + qv[0] + qv[1] + qv[2] + qv[3] * 2
                     + qv[4] * 2 + qv[5] * 2 + qv[6] * 5 + 8) >> 4;
            o[11] = (pv[0] + qv[0] + qv[1] + qv[2] + qv[3] + qv[4] * 2
                     + qv[5] * 2 + qv[6] * 7 + 8) >> 4;               /* 5 */
            /* offsets -6..-1 are P(5)..P(0); offsets 0..5 are Q(0)..Q(5) */
            for (int k = 0; k < 6; k++) P(5 - k) = o[k];
            for (int k = 0; k < 6; k++) Q(k) = o[6 + k];
            return;
        }
        /* fall through to filter8 on flat-but-not-flat2 */
    }

    if (size >= 8 && flat) {
        int o_3 = (p3 + p3 + p3 + 2 * p2 + p1 + p0 + q0 + 4) >> 3;
        int o_2 = (p3 + p3 + p2 + 2 * p1 + p0 + q0 + q1 + 4) >> 3;
        int o_1 = (p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2 + 4) >> 3;
        int o0 = (p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3 + 4) >> 3;
        int o1 = (p1 + p0 + q0 + 2 * q1 + q2 + q3 + q3 + 4) >> 3;
        int o2 = (p0 + q0 + q1 + 2 * q2 + q3 + q3 + q3 + 4) >> 3;
        P(2) = o_3;
        P(1) = o_2;
        P(0) = o_1;
        Q(0) = o0;
        Q(1) = o1;
        Q(2) = o2;
        return;
    }
    if (size == 6 && flat) {
        int o_2 = (p2 * 3 + p1 * 2 + p0 * 2 + q0 + 4) >> 3;
        int o_1 = (p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1 + 4) >> 3;
        int o0 = (p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2 + 4) >> 3;
        int o1 = (p0 + q0 * 2 + q1 * 2 + q2 * 3 + 4) >> 3;
        P(1) = o_2;
        P(0) = o_1;
        Q(0) = o0;
        Q(1) = o1;
        return;
    }

    /* narrow filter4 (signed arithmetic scaled for bitdepth) */
    int mxv = (1 << bd) - 1;
    int half = 1 << (bd - 1);
#define CL(x) ((x) < -half ? -half : ((x) > half - 1 ? half - 1 : (x)))
    int ps1 = p1 - half, ps0 = p0 - half;
    int qs0 = q0 - half, qs1 = q1 - half;
    int hev = iabs(p1 - p0) > thresh || iabs(q1 - q0) > thresh;
    int f = hev ? CL(ps1 - qs1) : 0;
    f = CL(f + 3 * (qs0 - ps0));
    int f1 = CL(f + 4) >> 3;
    int f2 = CL(f + 3) >> 3;
    int oq0 = CL(qs0 - f1) + half;
    int op0 = CL(ps0 + f2) + half;
    Q(0) = oq0 < 0 ? 0 : (oq0 > mxv ? mxv : oq0);
    P(0) = op0 < 0 ? 0 : (op0 > mxv ? mxv : op0);
    if (!hev) {
        int f3 = (f1 + 1) >> 1;
        int oq1 = CL(qs1 - f3) + half;
        int op1 = CL(ps1 + f3) + half;
        Q(1) = oq1 < 0 ? 0 : (oq1 > mxv ? mxv : oq1);
        P(1) = op1 < 0 ? 0 : (op1 > mxv ? mxv : op1);
    }
#undef CL
#undef P
#undef Q
}

typedef struct {
    int gw, gh;
    uint8_t *txw, *txh, *skip, *edge_left, *edge_top, *lvl0, *lvl1;
} LfGrids;

static int lf_build_grids(const ReconParams *rp, const TileOut *o,
                          int plane, int pw, int ph, LfGrids *g) {
    int gw = (pw + 3) >> 2, gh = (ph + 3) >> 2;
    g->gw = gw;
    g->gh = gh;
    size_t n = (size_t)gw * gh;
    g->txw = malloc(n * 7);
    if (!g->txw) return 1;
    g->txh = g->txw + n;
    g->skip = g->txh + n;
    g->edge_left = g->skip + n;
    g->edge_top = g->edge_left + n;
    g->lvl0 = g->edge_top + n;
    g->lvl1 = g->lvl0 + n;
    memset(g->txw, 1, n * 2);
    memset(g->skip, 0, n * 5);
    int ssx = plane ? rp->ssx : 0;
    int ssy = plane ? rp->ssy : 0;
    for (int64_t bi = 0; bi < o->n_blocks; bi++) {
        const int32_t *b = o->blocks + bi * BLK_FIELDS;
        if (plane && !b[10]) continue;   /* has_chroma */
        int bx = b[1] >> ssx, by = b[0] >> ssy;
        int bw = av1_block_w4[b[2]] >> ssx;
        int bh = av1_block_h4[b[2]] >> ssy;
        if (bw < 1) bw = 1;
        if (bh < 1) bh = 1;
        int x1 = bx + bw < gw ? bx + bw : gw;
        int y1 = by + bh < gh ? by + bh : gh;
        if (bx >= gw || by >= gh) continue;
        int tx = plane == 0 ? b[8] : b[9];
        int l0 = lf_level_for_blk(rp, plane, 0, b);
        int l1 = lf_level_for_blk(rp, plane, 1, b);
        for (int r = by; r < y1; r++)
            for (int c = bx; c < x1; c++) {
                g->txw[r * gw + c] = (uint8_t)av1_tx_w4[tx];
                g->txh[r * gw + c] = (uint8_t)av1_tx_h4[tx];
                g->skip[r * gw + c] = (uint8_t)b[7];
                g->lvl0[r * gw + c] = (uint8_t)l0;
                g->lvl1[r * gw + c] = (uint8_t)l1;
            }
        for (int r = by; r < y1; r++) g->edge_left[r * gw + bx] = 1;
        for (int c = bx; c < x1; c++) g->edge_top[by * gw + c] = 1;
    }
    /* overlay the actual tx tree (covers tx splits in coded blocks) */
    for (int64_t k = 0; k < o->n_lf; k++) {
        const int32_t *lf = o->lf_txs + k * 4;
        if (lf[0] != plane) continue;
        int cx = lf[1] >> 2, cy = lf[2] >> 2;
        int tw4 = av1_tx_w4[lf[3]], th4 = av1_tx_h4[lf[3]];
        int x1 = cx + tw4 < gw ? cx + tw4 : gw;
        int y1 = cy + th4 < gh ? cy + th4 : gh;
        if (cx >= gw || cy >= gh) continue;
        for (int r = cy; r < y1; r++)
            for (int c = cx; c < x1; c++) {
                g->txw[r * gw + c] = (uint8_t)tw4;
                g->txh[r * gw + c] = (uint8_t)th4;
            }
    }
    return 0;
}

static void lf_pass(const ReconParams *rp, pel *buf, int pw, int ph,
                    int plane, int pass, const LfGrids *g) {
    const uint8_t *lvls = pass == 0 ? g->lvl0 : g->lvl1;
    int lim_c[64], blim_c[64], thr_c[64];
    uint8_t have[64];
    memset(have, 0, sizeof(have));
    const int gstride = g->gw;
    const int stride = pw;          /* buffer row stride (aligned) */
    int gw = g->gw, gh = g->gh;
    /* deblocking covers only the VISIBLE frame in 4px units (chroma
       bound derived from the luma unit count); the mi-aligned
       extension stays unfiltered for CDEF to read as plain recon */
    {
        int ssx = plane ? rp->ssx : 0, ssy = plane ? rp->ssy : 0;
        int h4u = (rp->frame_height + 3) >> 2;
        int w4u = (rp->frame_width + 3) >> 2;
        int vis_h = (((h4u + ssy) >> ssy) << 2);
        int vis_w = (((w4u + ssx) >> ssx) << 2);
        if (vis_h < ph) ph = vis_h;
        if (vis_w < pw) pw = vis_w;
        if (((vis_h + 3) >> 2) < gh) gh = (vis_h + 3) >> 2;
        if (((vis_w + 3) >> 2) < gw) gw = (vis_w + 3) >> 2;
    }
    if (pass == 0) {   /* vertical edges */
        for (int cy = 0; cy < gh; cy++)
            for (int cx = 1; cx < gw; cx++) {
                int x = cx * 4;
                if (x >= pw) break;
                if ((x >> 2) % g->txw[cy * gstride + cx] != 0) continue;
                int is_edge = g->edge_left[cy * gstride + cx];
                if (!is_edge && g->skip[cy * gstride + cx]
                    && g->skip[cy * gstride + cx - 1]) continue;
                int lvl = lvls[cy * gstride + cx];
                if (!lvl) lvl = lvls[cy * gstride + cx - 1];
                if (!lvl) continue;
                if (!have[lvl]) {
                    lf_limits(lvl, rp->lf_sharpness, rp->bitdepth,
                              &lim_c[lvl], &blim_c[lvl], &thr_c[lvl]);
                    have[lvl] = 1;
                }
                int limit = lim_c[lvl], blimit = blim_c[lvl];
                int thresh = thr_c[lvl];
                int min_tx = (g->txw[cy * gstride + cx] < g->txw[cy * gstride + cx - 1]
                              ? g->txw[cy * gstride + cx]
                              : g->txw[cy * gstride + cx - 1]) * 4;
                int size;
                if (plane == 0)
                    size = min_tx >= 16 ? 14 : (min_tx >= 8 ? 8 : 4);
                else
                    size = min_tx >= 8 ? 6 : 4;
                int y0 = cy * 4;
                int ymax = ph - y0 < 4 ? ph - y0 : 4;
                for (int dy = 0; dy < ymax; dy++)
                    lf_line(buf, (int64_t)(y0 + dy) * stride + x, 1, size,
                            limit, blimit, thresh, rp->bitdepth);
            }
    } else {           /* horizontal edges */
        for (int cy = 1; cy < gh; cy++) {
            int y = cy * 4;
            if (y >= ph) break;
            for (int cx = 0; cx < gw; cx++) {
                if ((y >> 2) % g->txh[cy * gstride + cx] != 0) continue;
                int is_edge = g->edge_top[cy * gstride + cx];
                if (!is_edge && g->skip[cy * gstride + cx]
                    && g->skip[(cy - 1) * gstride + cx]) continue;
                int lvl = lvls[cy * gstride + cx];
                if (!lvl) lvl = lvls[(cy - 1) * gstride + cx];
                if (!lvl) continue;
                if (!have[lvl]) {
                    lf_limits(lvl, rp->lf_sharpness, rp->bitdepth,
                              &lim_c[lvl], &blim_c[lvl], &thr_c[lvl]);
                    have[lvl] = 1;
                }
                int limit = lim_c[lvl], blimit = blim_c[lvl];
                int thresh = thr_c[lvl];
                int min_tx = (g->txh[cy * gstride + cx]
                              < g->txh[(cy - 1) * gstride + cx]
                              ? g->txh[cy * gstride + cx]
                              : g->txh[(cy - 1) * gstride + cx]) * 4;
                int size;
                if (plane == 0)
                    size = min_tx >= 16 ? 14 : (min_tx >= 8 ? 8 : 4);
                else
                    size = min_tx >= 8 ? 6 : 4;
                int x0 = cx * 4;
                int xmax = pw - x0 < 4 ? pw - x0 : 4;
                for (int dx = 0; dx < xmax; dx++)
                    lf_line(buf, (int64_t)y * stride + x0 + dx, stride, size,
                            limit, blimit, thresh, rp->bitdepth);
            }
        }
    }
}

static void av1_loop_filter(const ReconParams *rp, const TileOut *o,
                            pel *planes[3], const int pw[3],
                            const int ph[3]) {
    if (rp->lf_level[0] == 0 && rp->lf_level[1] == 0
        && rp->lf_level[2] == 0 && rp->lf_level[3] == 0) return;
    if (rp->allow_intrabc) return;
    for (int plane = 0; plane < rp->num_planes; plane++) {
        LfGrids g;
        if (lf_build_grids(rp, o, plane, pw[plane], ph[plane], &g))
            return;
        /* spec 7.14.1: luma skipped only when BOTH level[0] and
           level[1] are zero — a zero base still filters edges whose
           delta-adjusted level is nonzero */
        if (plane == 0 && rp->lf_level[0] == 0 && rp->lf_level[1] == 0)
            { free(g.txw); continue; }
        for (int pass = 0; pass < 2; pass++) {
            if (plane == 1 && rp->lf_level[2] == 0) continue;
            if (plane == 2 && rp->lf_level[3] == 0) continue;
            lf_pass(rp, planes[plane], pw[plane], ph[plane], plane, pass,
                    &g);
        }
        free(g.txw);
    }
}
