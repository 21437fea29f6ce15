/* Shared parameter/output layouts between the native tile decoder
 * (av1_tile.c) and frame reconstruction (av1_recon.c); mirrored by the
 * ctypes wrapper in __init__.py. */
#pragma once

#include <stdint.h>

typedef struct {
    int32_t mi_rows, mi_cols;
    int32_t sb128;
    int32_t bitdepth, num_planes, ssx, ssy;
    int32_t base_q_idx;
    int32_t dq_y_dc, dq_u_dc, dq_u_ac, dq_v_dc, dq_v_ac;
    int32_t tx_mode;              /* 0 only4x4, 1 largest, 2 select */
    int32_t reduced_tx_set;
    int32_t coded_lossless;
    int32_t allow_update_cdf;
    int32_t enable_cdef, cdef_bits;
    int32_t enable_filter_intra;
    int32_t allow_intrabc;
    int32_t delta_q_present, delta_q_res;
    int32_t delta_lf_present, delta_lf_multi;
    int32_t col_start, col_end, row_start, row_end;   /* mi units */
    int32_t qctx;
} TileParams;

typedef struct {
    /* mi grids, mi_rows x mi_cols row-major int8 */
    int8_t *y_mode, *uv_mode, *angle_y, *angle_uv, *skip, *bsize;
    /* block records, 16 int32 each:
       r, c, bsize, y_mode, uv_mode, angle_y, angle_uv, skip, tx_size,
       uv_tx_size, has_chroma, cfl_u, cfl_v, filter_intra(-1 none),
       tx_off, n_tx */
    int32_t *blocks;
    int64_t max_blocks, n_blocks;
    /* coded (non-all-zero) tx records, 8 int32 each:
       plane, x, y, tx_size, tx_type, eob, coef_off, lossless */
    int32_t *txs;
    int64_t max_txs, n_txs;
    int32_t *coeffs;           /* adj_h*adj_w dense values per coded tx */
    int64_t coeffs_cap, coeffs_used;
    /* every visited tx incl. all-zero, 4 int32 each: plane, x, y, tx_size */
    int32_t *lf_txs;
    int64_t max_lf, n_lf;
    /* cdef idx per 64x64 unit: ceil(mi_rows/16) x ceil(mi_cols/16),
       -1 = unset */
    int8_t *cdef_idx;
    int32_t error;
} TileOut;

/* frame reconstruction parameters (recon + loop filter + cdef) */
typedef struct {
    int32_t bitdepth, num_planes, ssx, ssy;
    int32_t mi_rows, mi_cols;
    int32_t enable_intra_edge_filter;
    int32_t lf_level[4];
    int32_t lf_sharpness;
    int32_t lf_delta_enabled;
    int32_t lf_ref_delta_intra;
    int32_t enable_cdef, cdef_damping;
    int32_t cdef_y_pri[8], cdef_y_sec[8];
    int32_t cdef_uv_pri[8], cdef_uv_sec[8];
    int32_t coded_lossless, allow_intrabc;
    int32_t frame_width, frame_height;   /* visible (cropped) dims */
} ReconParams;
