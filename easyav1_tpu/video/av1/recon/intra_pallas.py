"""Pallas TPU kernel: sequential intra pred-unit executor.

Implements the bridge contract (exec_ref semantics) as a Mosaic kernel:
grid = one step per superblock row ("strip", 64 px, 128 for sb128
streams); each step DMAs the strip's residual in, replays the strip's
pred units sequentially from VMEM in decode order, and DMAs the
reconstructed strip out.  The previous strip's bottom row persists in
VMEM scratch between steps, so cross-strip edges never touch HBM
mid-frame.

Mosaic addressing constraints shape the design: lane-dim slices must be
128-aligned, so every per-unit access loads an aligned [strip_h, EW]
superset window and normalizes it with dynamic lane rolls; all
irregular indexing is iota-mask register math.  Per-element gathers are
avoided entirely:
  - edge filter taps     -> uniform rolls + boundary scalar selects
  - upsample interleave  -> pltpu.repeat + rolls
  - directional zones    -> per-row/col loops of uniform rolls
                            (stride-2 upsampled reads via a constant
                            0/1 selection matmul on the MXU)
  - CfL 2x2 downsample   -> two constant 0/1 matmuls (exact in f32)

Integer math is int32; every intermediate < 2^24, so the f32 matmul /
division detours are exact.  Bit-exactness contract: equals
exec_ref.UnitExecutor (and therefore the native C recon) on every
frame; tested by tests/test_intra_pallas.py in interpret mode and by
the device-pipeline conformance tests on hardware.
"""

from __future__ import annotations

import functools

import numpy as np

from easyav1_tpu.video.av1.recon.jax_exec import (
    NF, F_X, F_Y, F_W, F_H, F_CLS, F_ANGLE, F_HA, F_HL, F_HTR, F_HBL,
    F_SA, F_SL, F_UA, F_UL, F_CF, F_ALPHA, F_ACX, F_ACY, F_ACW, F_ACH,
    F_DX, F_DY, F_MAXXR, F_MAXYR, F_NPXA, F_NPXL, F_NA, F_NL, F_VALID,
    K_DC, K_V, K_H, K_Z1, K_Z2, K_Z3, K_SM, K_SMV, K_SMH, K_PAETH,
    K_CFL, _tables)

EW = 384          # edge-vector width (lanes; post-upsample reach)
BW = 256          # per-unit 2D window width (covers rel<=128 + w<=64)
LPAD = 128        # left margin so aligned windows never go negative
PW = 128          # pred window width (max unit w is 64)


def _sm_rows():
    _, sm = _tables()
    offs = {4: 0, 8: 4, 16: 12, 32: 28, 64: 60}
    out = np.zeros((8, 128), np.int32)
    for k, n in enumerate((4, 8, 16, 32, 64)):
        out[k, :n] = sm[offs[n]:offs[n] + n]
        out[k, n:] = sm[offs[n] + n - 1]
    return out


def plane_layout(ph: int, pw: int, strip_h: int):
    """(Hp, Wp) padded plane layout for the kernel."""
    nstrips = -(-ph // strip_h)
    wp = ((pw + LPAD + EW + 127) // 128) * 128
    return nstrips * strip_h, wp, nstrips


@functools.lru_cache(maxsize=None)
def make_strip_kernel(strip_h: int, wp: int, nstrips: int, umax: int,
                      bitdepth: int, with_cfl: bool, luma_wp: int,
                      interpret: bool = False):
    """fn(units[nstrips,umax,NF], counts[nstrips,8], consts,
    resid[Hp,wp] [, luma[2*Hp,luma_wp]]) -> plane [Hp,wp] int32."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mx = (1 << bitdepth) - 1
    base = 1 << (bitdepth - 1)
    hp = nstrips * strip_h
    SH = strip_h

    # constant matrices (exact 0/1 f32)
    smrows_np = _sm_rows()
    # CfL downsamplers: D1 [SH, 2SH] row-pairs, D2 [256,128] col-pairs
    d1 = np.zeros((SH, 2 * SH), np.float32)
    for i in range(SH):
        d1[i, 2 * i] = 1.0
        d1[i, 2 * i + 1] = 1.0
    d2 = np.zeros((256, PW), np.float32)
    for j in range(PW):
        d2[2 * j, j] = 1.0
        d2[2 * j + 1, j] = 1.0
    # stride-2 lane selector for upsampled directional reads:
    # S2 [256, PW] with S2[2l, l] = 1
    s2 = np.zeros((256, PW), np.float32)
    for j in range(PW):
        s2[2 * j, j] = 1.0
    # element-wise x2 lane expander (pltpu.repeat is tile-like):
    # R2 [192, EW] with R2[i, 2i] = R2[i, 2i+1] = 1
    r2 = np.zeros((192, EW), np.float32)
    for i in range(192):
        r2[i, 2 * i] = 1.0
        if 2 * i + 1 < EW:
            r2[i, 2 * i + 1] = 1.0

    # filter-intra taps (5 modes x 8 outputs x 8 taps) packed into a
    # lane-padded VMEM constant: row m*8+k lanes 0-7 = taps[m][k][:]
    fi_np = np.zeros((40, 128), np.int32)
    from easyav1_tpu.video.av1 import tables as _T
    fi_np[:, :8] = np.asarray(_T.data()["filter_intra_taps"],
                              np.int32).reshape(40, 8)

    def kernel(*refs):
        if with_cfl:
            (units_ref, counts_ref, smr, d1r, d2r, s2r, r2r, fir,
             resid_hbm, luma_hbm, out_hbm, strip, rstrip, prev_row,
             lstrip, sem) = refs
        else:
            (units_ref, counts_ref, smr, d1r, d2r, s2r, r2r, fir,
             resid_hbm, out_hbm, strip, rstrip, prev_row, lstrip,
             sem) = refs
            luma_hbm = None
        step = pl.program_id(0)
        y0 = step * SH

        dma_r = pltpu.make_async_copy(
            resid_hbm.at[pl.ds(y0, SH), :], rstrip, sem)
        dma_r.start()
        dma_r.wait()
        if with_cfl:
            dma_l = pltpu.make_async_copy(
                luma_hbm.at[pl.ds(2 * y0, 2 * SH), :], lstrip, sem)
            dma_l.start()
            dma_l.wait()

        io_e = jax.lax.broadcasted_iota(jnp.int32, (1, EW), 1)
        io_r = jax.lax.broadcasted_iota(jnp.int32, (SH, BW), 0)
        io_c = jax.lax.broadcasted_iota(jnp.int32, (SH, BW), 1)
        io_lc = jax.lax.broadcasted_iota(jnp.int32, (SH, 128), 1)
        io_p = jax.lax.broadcasted_iota(jnp.int32, (SH, PW), 1)
        io_pr = jax.lax.broadcasted_iota(jnp.int32, (SH, PW), 0)

        def _switch(idx, branches):
            """Mosaic-safe lax.switch: binary tree of lax.cond so only
            the taken branch's program executes."""
            def build(lo, hi):
                if hi - lo == 1:
                    return branches[lo]
                mid = (lo + hi) // 2
                return lambda: jax.lax.cond(
                    idx < mid, build(lo, mid), build(mid, hi))
            return build(0, len(branches))()

        def lane_extract(vec, idx):
            return jnp.sum(jnp.where(io_e == idx, vec, 0))

        def rot(x, k, axis=1):
            """Right-rotate by k (any sign, traced or static)."""
            n = x.shape[axis]
            if isinstance(k, int):
                return pltpu.roll(x, shift=k % n, axis=axis)
            kk = jnp.remainder(k, n).astype(jnp.int32)
            return pltpu.roll(x, shift=kk, axis=axis)

        def edge_filter(edge, sz, strength, active):
            """exec_ref._edge_filter on the slot layout (view index
            v = slot-1; v0 = corner kept)."""
            k0 = jnp.where(strength == 3, 2, 0)
            k1 = jnp.where(strength == 2, 5, 4)
            k2 = jnp.where(strength == 1, 8,
                           jnp.where(strength == 2, 6, 4))
            taps = (k0, k1, k2, k1, k0)
            v = io_e - 1
            lo = lane_extract(edge, 1)
            hi = lane_extract(edge, sz)
            acc = jnp.zeros((1, EW), jnp.int32)
            for t in range(5):
                sh = t - 2
                moved = rot(edge, -sh, axis=1)
                val = jnp.where(v + sh < 0, lo,
                                jnp.where(v + sh > sz - 1, hi, moved))
                acc = acc + taps[t] * val
            filt = (acc + 8) >> 4
            keep = (v < 1) | (v >= sz) | (strength == 0) \
                | jnp.logical_not(active)
            return jnp.where(keep, edge, filt)

        def upsample(edge, num_px, do):
            """exec_ref._upsample_edge on the slot layout."""
            corner = lane_extract(edge, 1)
            # dup[v]: v<2 -> corner, v in 2..num_px+1 -> px[v-2],
            # beyond -> px[num_px-1]; lanes = view index v = io_e
            pxv = rot(edge, -2, axis=1)   # lane k = px[k]
            plast = lane_extract(edge, 2 + num_px - 1)
            pxc = jnp.where(io_e > num_px - 1, plast, pxv)
            dup = jnp.where(io_e < 2, corner,
                            rot(pxc, 2, axis=1))
            s = (-dup
                 + 9 * rot(dup, -1, axis=1)
                 + 9 * rot(dup, -2, axis=1)
                 - rot(dup, -3, axis=1))
            s = jnp.clip((s + 8) >> 4, 0, mx)          # lane i = s[i]
            # new px[k]: k even -> px[k/2]; k odd -> s[(k+1)/2]
            def rep2(v):
                r = jnp.dot(v[0:1, 0:192].astype(jnp.float32),
                            r2r[...],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                return r.astype(jnp.int32)

            ev = rep2(pxc)
            od = rot(rep2(s), -1, axis=1)
            k = io_e
            newpx = jnp.where((k & 1) == 0, ev, od)
            newpx = jnp.where(k <= 2 * num_px - 2, newpx, pxc)
            s0 = lane_extract(s, 0)
            out = rot(newpx, 2, axis=1)
            out = jnp.where(io_e == 0, corner,
                            jnp.where(io_e == 1, s0, out))
            return jnp.where(do, out, edge)

        def stride2(vec256):
            """[1,256] -> [1,PW] taking even lanes (exact f32 matmul)."""
            r = jnp.dot(vec256.astype(jnp.float32), s2r[...],
                        preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
            return r.astype(jnp.int32)

        io8u = jax.lax.broadcasted_iota(jnp.int32, (8, 32), 0)

        def unit(i, carry):
            u8 = pl.multiple_of((i >> 3) * 8, 8)
            rows = units_ref[0, pl.ds(u8, 8), :]      # [8, 32]
            frow = jnp.sum(jnp.where(io8u == (i - u8), rows, 0),
                           axis=0, keepdims=True)     # [1, 32]

            def f(k):
                return frow[0, k]

            x = f(F_X) + LPAD
            y = f(F_Y)
            w = f(F_W)
            h = f(F_H)
            cls = f(F_CLS)
            ha = f(F_HA) != 0
            hl = f(F_HL) != 0
            yr = y - y0

            xb = pl.multiple_of(((x - 1) >> 7) * 128, 128)
            rel = x - xb

            prow = prev_row[0:1, pl.ds(xb, BW)]

            yra = pl.multiple_of((jnp.maximum(yr - 1, 0) >> 3) * 8, 8)
            rows8 = strip[pl.ds(yra, 8), pl.ds(xb, BW)]
            io8 = jax.lax.broadcasted_iota(jnp.int32, (8, BW), 0)
            in_row = jnp.sum(
                jnp.where(io8 == (yr - 1 - yra), rows8, 0), axis=0,
                keepdims=True)
            araw = jnp.where(yr == 0, prow, in_row)
            # edge vectors live in [1, EW]; lanes past the BW source
            # window are junk but always >= 2+ka_max and get clamped
            a_n = rot(jnp.pad(araw, ((0, 0), (0, EW - BW))),
                      2 - rel, axis=1)

            wl = strip[:, pl.ds(xb, 128)]
            lcolv = jnp.sum(
                jnp.where(io_lc == (rel - 1), wl, 0), axis=1,
                keepdims=True)                    # [SH, 1]
            l_lane = jnp.transpose(lcolv)         # [1, SH]
            l_lane = jnp.pad(l_lane, ((0, 0), (0, EW - SH)))
            l_n = rot(l_lane, 2 - yr, axis=1)

            ka_max = jnp.minimum(f(F_NA) - 1, f(F_MAXXR))
            a_last = lane_extract(a_n, 2 + ka_max)
            a_px = jnp.where(io_e - 2 > ka_max, a_last, a_n)
            kl_max = jnp.minimum(f(F_NL) - 1, f(F_MAXYR))
            l_last = lane_extract(l_n, 2 + kl_max)
            l_px = jnp.where(io_e - 2 > kl_max, l_last, l_n)

            a0 = lane_extract(a_n, 2)
            l0 = lane_extract(l_n, 2)
            corner_raw = lane_extract(a_n, 1)
            fill_a = jnp.where(hl, l0, base - 1)
            fill_l = jnp.where(ha, a0, base + 1)
            a_px = jnp.where(ha, a_px, fill_a)
            l_px = jnp.where(hl, l_px, fill_l)
            corner = jnp.where(ha & hl, corner_raw,
                               jnp.where(ha, a0,
                                         jnp.where(hl, l0, base)))
            # slot layout matches exec_ref: slot1 = corner, slot0
            # stays 0 unless upsample writes the shifted corner there
            above = jnp.where(io_e == 0, 0,
                              jnp.where(io_e == 1, corner, a_px))
            left = jnp.where(io_e == 0, 0,
                             jnp.where(io_e == 1, corner, l_px))

            is_dir = (cls == K_Z1) | (cls == K_Z2) | (cls == K_Z3)
            ang = f(F_ANGLE)
            ua = jnp.where((f(F_UA) != 0) & is_dir, 1, 0)
            ul = jnp.where((f(F_UL) != 0) & is_dir, 1, 0)

            def prep_dir():
                a, l = above, left
                cfil = f(F_CF) != 0
                csv = (lane_extract(l, 2) * 5 + corner * 6
                       + lane_extract(a, 2) * 5 + 8) >> 4
                a = jnp.where(cfil & (io_e == 1), csv, a)
                l = jnp.where(cfil & (io_e == 1), csv, l)
                a = edge_filter(a, f(F_NPXA), f(F_SA), ha)
                l = edge_filter(l, f(F_NPXL), f(F_SL), hl)
                a = upsample(a, w + jnp.where(ang < 90, h, 0),
                             ua == 1)
                l = upsample(l, h + jnp.where(ang > 180, w, 0),
                             ul == 1)
                return a, l

            above, left = jax.lax.cond(
                is_dir, prep_dir, lambda: (above, left))
            corner2 = lane_extract(above, 1)

            A1 = rot(above, -2, axis=1)[0:1, 0:PW]
            L1 = rot(left, -2, axis=1)[0:1, 0:PW]
            Lsub = jnp.transpose(L1[0:1, 0:SH])      # [SH, 1]
            Arow = jnp.broadcast_to(A1, (SH, PW))
            Lcol = jnp.broadcast_to(Lsub, (SH, PW))

            # ---- predictor branches (only the taken one runs) ----
            def br_dc():
                both = ha & hl
                in_a = (io_e >= 2) & (io_e - 2 < w)
                in_l = (io_e >= 2) & (io_e - 2 < h)
                suma = jnp.sum(jnp.where(in_a, above, 0))
                suml = jnp.sum(jnp.where(in_l, left, 0))
                dnum = jnp.where(both, suma + suml,
                                 jnp.where(ha, suma, suml))
                dden = jnp.where(both, w + h, jnp.where(ha, w, h))
                davg = jnp.where(
                    ha | hl,
                    ((dnum + (dden >> 1)).astype(jnp.float32)
                     / dden.astype(jnp.float32)).astype(jnp.int32),
                    base)
                return jnp.full((SH, PW), davg, jnp.int32)

            def br_v():
                return Arow + jnp.zeros((SH, PW), jnp.int32)

            def br_h():
                return Lcol + jnp.zeros((SH, PW), jnp.int32)

            def br_paeth():
                pp = Arow + Lcol - corner2
                pb = jnp.abs(pp - Arow)
                plf = jnp.abs(pp - Lcol)
                pc = jnp.abs(pp - corner2)
                return jnp.where((plf <= pb) & (plf <= pc), Lcol,
                                 jnp.where(pb <= pc, Arow, corner2))

            def _smooth_w():
                lgw = 29 - jax.lax.clz(w)      # log2(w) - 2
                lgh = 29 - jax.lax.clz(h)
                io5 = jax.lax.broadcasted_iota(jnp.int32, (8, PW), 0)
                wxv = jnp.sum(jnp.where(io5 == lgw, smr[...], 0),
                              axis=0, keepdims=True)    # [1, PW]
                wyv = jnp.sum(jnp.where(io5 == lgh, smr[...], 0),
                              axis=0, keepdims=True)
                wy_sub = jnp.transpose(wyv[0:1, 0:SH])
                wyb = jnp.broadcast_to(wy_sub, (SH, PW))
                wxb = jnp.broadcast_to(wxv, (SH, PW))
                below = lane_extract(left, 2 + h - 1)
                right = lane_extract(above, 2 + w - 1)
                return wyb, wxb, below, right

            def br_sm():
                wyb, wxb, below, right = _smooth_w()
                return (wyb * Arow + (256 - wyb) * below
                        + wxb * Lcol + (256 - wxb) * right + 256) >> 9

            def br_smv():
                wyb, wxb, below, right = _smooth_w()
                return (wyb * Arow + (256 - wyb) * below + 128) >> 8

            def br_smh():
                wyb, wxb, below, right = _smooth_w()
                return (wxb * Lcol + (256 - wxb) * right + 128) >> 8

            # ---- directional zones -------------------------------
            def dir_read(edge, b, up):
                """[1,PW]: lane j = edge px [b + (j<<up)] (and +1)."""
                r0 = rot(edge, -(b + 2), axis=1)
                r1 = rot(edge, -(b + 3), axis=1)
                e0n = r0[0:1, 0:PW]
                e1n = r1[0:1, 0:PW]
                e0u = stride2(r0[0:1, 0:256])
                e1u = stride2(r1[0:1, 0:256])
                e0 = jnp.where(up == 1, e0u, e0n)
                e1 = jnp.where(up == 1, e1u, e1n)
                return e0, e1

            zeros = jnp.zeros((SH, PW), jnp.int32)

            def tr_to_pred(acc_t):
                # transposed accumulator (cols in sublanes) -> pred
                t = jnp.transpose(acc_t)[0:SH, 0:min(SH, PW)]
                if PW > SH:
                    t = jnp.concatenate(
                        [t, jnp.zeros((SH, PW - SH), jnp.int32)],
                        axis=1)
                return t

            def br_z1():
                mba = (w + h - 1) << ua
                vmax_a = lane_extract(above, 2 + mba)

                def z1_body(i, acc):
                    idx = (i + 1) * f(F_DX)
                    b = idx >> (6 - ua)
                    sh = ((idx << ua) >> 1) & 0x1F
                    e0, e1 = dir_read(above, b, ua)
                    lanes = io_p[0:1]
                    bb = b + (lanes << ua)
                    row = (e0 * (32 - sh) + e1 * sh + 16) >> 5
                    row = jnp.where(bb >= mba, vmax_a, row)
                    return jnp.where(io_pr == i, row, acc)

                return jax.lax.fori_loop(0, h, z1_body, zeros)

            def br_z3():
                mbl = (w + h - 1) << ul
                vmax_l = lane_extract(left, 2 + mbl)

                def z3_body(j, acc):
                    idy = (j + 1) * f(F_DY)
                    b = idy >> (6 - ul)
                    sh = ((idy << ul) >> 1) & 0x1F
                    e0, e1 = dir_read(left, b, ul)
                    lanes = io_p[0:1]
                    bb = b + (lanes << ul)
                    col = (e0 * (32 - sh) + e1 * sh + 16) >> 5
                    col = jnp.where(bb >= mbl, vmax_l, col)
                    return jnp.where(io_pr == j, col, acc)

                return tr_to_pred(
                    jax.lax.fori_loop(0, w, z3_body, zeros))

            def br_z2():
                v0l = lane_extract(left, 0)
                v1l = lane_extract(left, 1)

                def z2_row(i, acc):
                    idx0 = -(i + 1) * f(F_DX)
                    b0 = idx0 >> (6 - ua)
                    sh = ((idx0 << ua) >> 1) & 0x1F
                    e0, e1 = dir_read(above, b0, ua)
                    row = (e0 * (32 - sh) + e1 * sh + 16) >> 5
                    return jnp.where(io_pr == i, row, acc)

                def z2_col(j, acc):
                    idy0 = -(j + 1) * f(F_DY)
                    b0 = idy0 >> (6 - ul)
                    sh = ((idy0 << ul) >> 1) & 0x1F
                    e0, e1 = dir_read(left, b0, ul)
                    col = (e0 * (32 - sh) + e1 * sh + 16) >> 5
                    # spec clamps base_y at -2: lanes below read
                    # slot0/1
                    bbl = b0 + (io_p[0:1] << ul)
                    clv = (v0l * (32 - sh) + v1l * sh + 16) >> 5
                    col = jnp.where(bbl < -2, clv, col)
                    return jnp.where(io_pr == j, col, acc)

                rows = jax.lax.fori_loop(0, h, z2_row, zeros)
                cols = tr_to_pred(
                    jax.lax.fori_loop(0, w, z2_col, zeros))
                bb = (io_p << ua) \
                    + ((-(io_pr + 1) * f(F_DX)) >> (6 - ua))
                return jnp.where(bb >= -(1 << ua), rows, cols)

            def br_filt():
                # recursive filter intra (spec 7.11.2.3, parity:
                # recon_ref._filter_intra_pred): 4x2 patches in raster
                # order; W row 0 = above slots, col 0 = left slots,
                # interior = the growing pred buffer.  f(F_ANGLE)
                # carries the filter mode; taps live in the fir const.
                mode = jnp.clip(f(F_ANGLE), 0, 4)
                taps = fir[pl.ds(pl.multiple_of(mode * 8, 8), 8), :]
                io8r = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                io8l = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                n_w = (w + 3) >> 2
                n_h = (h + 1) >> 1

                def wread(Wp, r, c):
                    """W[r][c]: above edge (r==0), left edge (c==0),
                    else the already-computed pred pixel."""
                    av = lane_extract(above, 1 + c)
                    lv = lane_extract(left, 1 + r)
                    pe = jnp.sum(jnp.where(
                        (io_pr == r - 1) & (io_p == c - 1), Wp, 0))
                    return jnp.where(r == 0, av,
                                     jnp.where(c == 0, lv, pe))

                def patch(s, Wp):
                    i = s >> 3
                    j = s & 7
                    y0 = 2 * i
                    x0 = 4 * j
                    act = (i < n_h) & (j < n_w)
                    pvals = [wread(Wp, y0, x0 + m) for m in range(5)]
                    pvals.append(wread(Wp, y0 + 1, x0))
                    pvals.append(wread(Wp, y0 + 2, x0))
                    pv8 = jnp.zeros((8, 128), jnp.int32)
                    for m, pm in enumerate(pvals):
                        pv8 = jnp.where(io8l == m, pm, pv8)
                    vsum = jnp.sum(jnp.where(io8l < 7, taps * pv8, 0),
                                   axis=1, keepdims=True)   # [8, 1]
                    out = Wp
                    for k in range(8):
                        vk = jnp.sum(jnp.where(io8r[:, 0:1] == k,
                                               vsum, 0))
                        vk = jnp.clip((vk + 8) >> 4, 0, mx)
                        out = jnp.where(
                            (io_pr == y0 + (k >> 2))
                            & (io_p == x0 + (k & 3)) & act, vk, out)
                    return out

                # filter-intra blocks cap at 32x32: 16x8 patches
                return jax.lax.fori_loop(0, 128, patch, zeros)

            pred = _switch(
                jnp.clip(cls, 0, 12),
                [br_dc, br_v, br_h, br_z1, br_z2, br_z3, br_sm,
                 br_smv, br_smh, br_paeth, br_dc,
                 lambda: zeros,    # K_ZERO: palette literal (pred
                                   # folded into the residual plane)
                 br_filt])

            # ---- CfL ---------------------------------------------
            if with_cfl:
                def cfl_add():
                    acx = f(F_ACX)
                    acy = f(F_ACY)
                    lx = acx * 2 + LPAD
                    lyr = (acy - y0) * 2
                    lxb = pl.multiple_of((lx >> 7) * 128, 128)
                    lrel = lx - lxb
                    lwm = lstrip[:, pl.ds(lxb, 256)]   # [2SH, 256]
                    lsum = jnp.dot(
                        jnp.dot(d1r[...], lwm.astype(jnp.float32),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST),
                        d2r[...],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    v = (lsum.astype(jnp.int32)) << 1   # [SH, PW]
                    v = rot(v, -(lyr >> 1), axis=0)
                    v = rot(v, -(lrel >> 1), axis=1)
                    acw = f(F_ACW)
                    ach = f(F_ACH)
                    acm = (io_p < acw) & (io_pr < ach)
                    tot = jnp.sum(jnp.where(acm, v, 0))
                    l2 = (31 - jax.lax.clz(jnp.maximum(acw, 1))) \
                        + (31 - jax.lax.clz(jnp.maximum(ach, 1)))
                    avg = (tot + (1 << jnp.clip(l2 - 1, 0, 30))) >> l2
                    ac = v - avg
                    offy = y - acy
                    offx = f(F_X) - acx
                    ac = rot(ac, -offy, axis=0)
                    ac = rot(ac, -offx, axis=1)
                    alpha = f(F_ALPHA)
                    diff = alpha * ac
                    scaled = jnp.sign(diff) \
                        * ((jnp.abs(diff) + 32) >> 6)
                    incfl = (alpha != 0) \
                        & (io_pr < (ach - offy)) & (io_p < (acw - offx))
                    return jnp.where(
                        incfl, jnp.clip(pred + scaled, 0, mx), pred)

                pred = jax.lax.cond(cls == K_CFL, cfl_add,
                                    lambda: pred)

            # ---- blend -------------------------------------------
            # units up to 8 rows tall (the vast majority) blend into a
            # 16-row slab instead of the whole (SH, BW) window: the
            # full-height read-modify-write was ~4x the useful work of
            # a 4/8-px unit and dominated the strip executor's
            # sequential per-unit cost
            small = h <= 8
            valid_u = f(F_VALID) != 0

            @pl.when(small)
            def _blend_slab():
                yra2 = pl.multiple_of(
                    jnp.minimum((yr >> 3) * 8, SH - 16), 8)
                yo = yr - yra2
                ps = jnp.pad(pred[0:16], ((0, 0), (0, BW - PW)))
                ps = rot(ps, rel, axis=1)
                ps = rot(ps, yo, axis=0)
                rw = rstrip[pl.ds(yra2, 16), pl.ds(xb, BW)]
                wd = strip[pl.ds(yra2, 16), pl.ds(xb, BW)]
                i16r = jax.lax.broadcasted_iota(jnp.int32, (16, BW), 0)
                i16c = jax.lax.broadcasted_iota(jnp.int32, (16, BW), 1)
                ov = jnp.clip(ps + rw, 0, mx)
                mk2 = (i16r >= yo) & (i16r < yo + h) \
                    & (i16c >= rel) & (i16c < rel + w) & valid_u
                strip[pl.ds(yra2, 16), pl.ds(xb, BW)] = \
                    jnp.where(mk2, ov, wd)

            @pl.when(jnp.logical_not(small))
            def _blend_full():
                wdw = strip[:, pl.ds(xb, BW)]
                rwin = rstrip[:, pl.ds(xb, BW)]
                pfull = jnp.pad(pred, ((0, 0), (0, BW - PW)))
                pfull = rot(pfull, rel, axis=1)
                pfull = rot(pfull, yr, axis=0)
                outv = jnp.clip(pfull + rwin, 0, mx)
                msk = (io_r >= yr) & (io_r < yr + h) \
                    & (io_c >= rel) & (io_c < rel + w) & valid_u
                strip[:, pl.ds(xb, BW)] = jnp.where(msk, outv, wdw)

            return carry

        n = counts_ref[0, 0, 0]
        jax.lax.fori_loop(0, n, unit, 0)

        prev_row[0:1, :] = strip[SH - 1:SH, :]
        dma_o = pltpu.make_async_copy(
            strip, out_hbm.at[pl.ds(y0, SH), :], sem)
        dma_o.start()
        dma_o.wait()

    in_specs = [
        pl.BlockSpec((1, umax, 32), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # smrows
        pl.BlockSpec(memory_space=pltpu.VMEM),   # d1
        pl.BlockSpec(memory_space=pltpu.VMEM),   # d2
        pl.BlockSpec(memory_space=pltpu.VMEM),   # s2
        pl.BlockSpec(memory_space=pltpu.VMEM),   # r2
        pl.BlockSpec(memory_space=pltpu.VMEM),   # fi taps
        pl.BlockSpec(memory_space=pltpu.ANY),    # resid
    ]
    if with_cfl:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))  # luma
    scratch = [
        pltpu.VMEM((SH, wp), jnp.int32),         # strip
        pltpu.VMEM((SH, wp), jnp.int32),         # rstrip
        pltpu.VMEM((1, wp), jnp.int32),          # prev_row
        pltpu.VMEM((2 * SH, luma_wp) if with_cfl else (8, 128),
                   jnp.int32),                   # lstrip
        pltpu.SemaphoreType.DMA,
    ]
    import jax

    call = pl.pallas_call(
        kernel,
        grid=(nstrips,),
        in_specs=in_specs,
        out_shape=jax.ShapeDtypeStruct((hp, wp), np.int32),
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=scratch,
        interpret=interpret,
    )

    import jax.numpy as jnp2
    smrows = jnp2.asarray(smrows_np)
    d1j = jnp2.asarray(d1)
    d2j = jnp2.asarray(d2)
    s2j = jnp2.asarray(s2)
    r2j = jnp2.asarray(r2)
    fij = jnp2.asarray(fi_np)

    if with_cfl:
        def fn(units, counts, resid, luma):
            return call(units, counts, smrows, d1j, d2j, s2j, r2j,
                        fij, resid, luma)
    else:
        def fn(units, counts, resid):
            return call(units, counts, smrows, d1j, d2j, s2j, r2j,
                        fij, resid)

    return jax.jit(fn)
