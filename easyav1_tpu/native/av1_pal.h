/* Screen-content syntax: palette mode (colors cache + delta coding +
 * wavefront index map, spec 5.11.46-52) and intra block copy DV
 * assignment (spec 5.11.19).  Included by av1_tile.c after av1_inter.h
 * (reuses find_mv_stack / read_mv / lower_precision).
 * Port of tile.py _read_palette_* / intrabc arm; dav1d pal.c +
 * decodemv.c read_intrabc_info roles. */
#pragma once

/* Y (plane 0) / CB (plane 1) palette colors: cache-reuse bools, then
 * ascending delta coding; returns merged sorted colors in out[n] */
static void read_palette_colors(Ctx *t, int plane, int r, int c, int n,
                                int32_t *out) {
    Msac *ms = &t->msac;
    int bd = t->p->bitdepth;
    int l_sz = t->l_pal_sz[plane][r];
    int a_sz = (r & 15) ? t->a_pal_sz[plane][c] : 0;
    const int32_t *lcol = t->l_pal[plane] + (int64_t)r * 8;
    const int32_t *acol = t->a_pal[plane] + (int64_t)c * 8;
    int cache[16], n_cache = 0;
    int li = 0, ai = 0;
    while (li < l_sz && ai < a_sz) {
        int lv = lcol[li], av = acol[ai];
        if (lv < av) {
            if (!n_cache || cache[n_cache - 1] != lv)
                cache[n_cache++] = lv;
            li++;
        } else {
            if (av == lv) li++;
            if (!n_cache || cache[n_cache - 1] != av)
                cache[n_cache++] = av;
            ai++;
        }
    }
    while (li < l_sz) {
        int lv = lcol[li++];
        if (!n_cache || cache[n_cache - 1] != lv) cache[n_cache++] = lv;
    }
    while (ai < a_sz) {
        int av = acol[ai++];
        if (!n_cache || cache[n_cache - 1] != av) cache[n_cache++] = av;
    }
    int used[8], n_used = 0;
    for (int k = 0; k < n_cache && n_used < n; k++)
        if (msac_bool_equi(ms)) used[n_used++] = cache[k];
    if (n_used == n) {
        memcpy(out, used, sizeof(int32_t) * (size_t)n);
        /* still sorted (cache ascending) */
        return;
    }
    int mind = plane == 0 ? 1 : 0;
    int mx = (1 << bd) - 1;
    int newv[8], n_new = 0;
    newv[n_new++] = (int)msac_literal(ms, bd);
    if (n_used + n_new < n) {
        int bits = bd - 3 + (int)msac_literal(ms, 2);
        int prev = newv[0];
        while (n_used + n_new < n) {
            int delta = (int)msac_literal(ms, bits) + mind;
            prev = prev + delta < mx ? prev + delta : mx;
            newv[n_new++] = prev;
            if (prev + mind >= mx) {
                while (n_used + n_new < n) newv[n_new++] = mx;
                break;
            }
            int room = mx - prev - mind;
            int bl = 0;
            for (int v = room; v; v >>= 1) bl++;
            if (bl < bits) bits = bl;
        }
    }
    /* merge two ascending lists */
    int ui = 0, ni = 0, k = 0;
    while (ui < n_used && ni < n_new)
        out[k++] = used[ui] <= newv[ni] ? used[ui++] : newv[ni++];
    while (ui < n_used) out[k++] = used[ui++];
    while (ni < n_new) out[k++] = newv[ni++];
}

/* CR palette: optional wraparound signed-delta coding */
static void read_palette_cr(Ctx *t, int n, int32_t *out) {
    Msac *ms = &t->msac;
    int bd = t->p->bitdepth;
    int mx = (1 << bd) - 1;
    if (msac_bool_equi(ms)) {
        int bits = bd - 4 + (int)msac_literal(ms, 2);
        int prev = (int)msac_literal(ms, bd);
        out[0] = prev;
        for (int k = 1; k < n; k++) {
            int delta = (int)msac_literal(ms, bits);
            if (delta && msac_bool_equi(ms)) delta = -delta;
            prev = (prev + delta) & mx;
            out[k] = prev;
        }
    } else {
        for (int k = 0; k < n; k++) out[k] = (int)msac_literal(ms, bd);
    }
}

/* Color index map over (h, w) pixels: NS first symbol, then wavefront
 * diagonals with neighbor-ordered symbols */
static void read_palette_map(Ctx *t, int n, int w, int h, int uv,
                             int8_t *m /* [h][w] */) {
    Msac *ms = &t->msac;
    m[0] = (int8_t)msac_decode_ns(&t->msac, n);
    uint16_t (*cdfs)[9] = uv ? t->cdf.palette_uv_color_index[n - 2]
                             : t->cdf.palette_y_color_index[n - 2];
    for (int i = 1; i < w + h - 1; i++) {
        int first = i < w - 1 ? i : w - 1;
        int last = i - h + 1 > 0 ? i - h + 1 : 0;
        for (int x = first; x >= last; x--) {
            int y = i - x;
            int have_left = x > 0, have_top = y > 0;
            int ctx;
            int order0[3], n0;
            if (!have_left) {
                ctx = 0;
                order0[0] = m[(y - 1) * w + x];
                n0 = 1;
            } else if (!have_top) {
                ctx = 0;
                order0[0] = m[y * w + (x - 1)];
                n0 = 1;
            } else {
                int lft = m[y * w + (x - 1)];
                int top = m[(y - 1) * w + x];
                int tl = m[(y - 1) * w + (x - 1)];
                if (lft == top && top == tl) {
                    ctx = 4;
                    order0[0] = top;
                    n0 = 1;
                } else if (top == lft) {
                    ctx = 3;
                    order0[0] = top;
                    order0[1] = tl;
                    n0 = 2;
                } else if (top == tl || lft == tl) {
                    ctx = 2;
                    order0[0] = tl;
                    order0[1] = top == tl ? lft : top;
                    n0 = 2;
                } else {
                    ctx = 1;
                    order0[0] = lft < top ? lft : top;
                    order0[1] = lft < top ? top : lft;
                    order0[2] = tl;
                    n0 = 3;
                }
            }
            int order[8], no = 0;
            for (int k = 0; k < n0; k++) order[no++] = order0[k];
            for (int k = 0; k < 8; k++) {
                int dup = 0;
                for (int j = 0; j < n0; j++)
                    if (order0[j] == k) dup = 1;
                if (!dup) order[no++] = k;
            }
            int sym = msac_ragged(ms, cdfs[ctx], 9, n);
            m[y * w + x] = (int8_t)order[sym];
        }
    }
}

/* intrabc DV (tile.py decode_block intrabc arm): dedicated ndv context,
 * forced integer precision, stack/fallback reference */
static void read_intrabc_dv(Ctx *t, int r, int c, int bsize,
                            int32_t *dv) {
    int rf[2] = {INTRA_FRAME, NONE_FRAME};
    MvStack st;
    find_mv_stack(t, r, c, bsize, rf, 0, &st);
    int32_t dv_ref[2];
    for (int cand = 0; cand < 2; cand++) {
        dv_ref[0] = st.mv[cand][0][0];
        dv_ref[1] = st.mv[cand][0][1];
        for (int k = 0; k < 2; k++)
            if (dv_ref[k] & 1)
                dv_ref[k] += dv_ref[k] > 0 ? -1 : 1;
        if (dv_ref[0] != 0 || dv_ref[1] != 0) break;
    }
    if (dv_ref[0] == 0 && dv_ref[1] == 0) {
        /* av1_find_ref_dv: one SB up, or (left - 256px) in the first
           SB row of the tile */
        int mib = t->p->sb128 ? 32 : 16;
        if (r - mib < t->p->row_start) {
            dv_ref[0] = 0;
            dv_ref[1] = (-4 * mib - 256) * 8;
        } else {
            dv_ref[0] = -4 * mib * 8;
            dv_ref[1] = 0;
        }
    }
    dv_ref[0] = (dv_ref[0] >> 3) * 8;
    dv_ref[1] = (dv_ref[1] >> 3) * 8;
    read_mv(t, dv_ref, /*dv=*/1, /*force_int=*/1, dv);
}
