/* Superres horizontal upscaling (spec §7.16), C port of
 * superres_ref.py — applied between CDEF and loop restoration.
 * Included by av1_recon.c. */
#pragma once

#define RS_SUBPEL_BITS 14
#define RS_SUBPEL_MASK ((1 << RS_SUBPEL_BITS) - 1)
#define RS_EXTRA_BITS 8
#define RS_EXTRA_OFF (1 << (RS_EXTRA_BITS - 1))
#define SR_FILTER_BITS 7

/* normative Upscale_Filter (spec 7.16), 64 phases x 8 taps */
static const int16_t SR_FILTER[64][8] = {
    {0,0,0,128,0,0,0,0},
    {0,0,-1,128,2,-1,0,0},
    {0,1,-3,127,4,-2,1,0},
    {0,1,-4,127,6,-3,1,0},
    {0,2,-6,126,8,-3,1,0},
    {0,2,-7,125,11,-4,1,0},
    {-1,2,-8,125,13,-5,2,0},
    {-1,3,-9,124,15,-6,2,0},
    {-1,3,-10,123,18,-6,2,-1},
    {-1,3,-11,122,20,-7,3,-1},
    {-1,4,-12,121,22,-8,3,-1},
    {-1,4,-13,120,25,-9,3,-1},
    {-1,4,-14,118,28,-9,3,-1},
    {-1,4,-15,117,30,-10,4,-1},
    {-1,5,-16,116,32,-11,4,-1},
    {-1,5,-16,114,35,-12,4,-1},
    {-1,5,-17,112,38,-12,4,-1},
    {-1,5,-18,111,40,-13,5,-1},
    {-1,5,-18,109,43,-14,5,-1},
    {-1,6,-19,107,45,-14,5,-1},
    {-1,6,-19,105,48,-15,5,-1},
    {-1,6,-19,103,51,-16,5,-1},
    {-1,6,-20,101,53,-16,6,-1},
    {-1,6,-20,99,56,-17,6,-1},
    {-1,6,-20,97,58,-17,6,-1},
    {-1,6,-20,95,61,-18,6,-1},
    {-2,7,-20,93,64,-18,6,-2},
    {-2,7,-20,91,66,-19,6,-1},
    {-2,7,-20,88,69,-19,6,-1},
    {-2,7,-20,86,71,-19,6,-1},
    {-2,7,-20,84,74,-20,7,-2},
    {-2,7,-20,81,76,-20,7,-1},
    {-2,7,-20,79,79,-20,7,-2},
    {-1,7,-20,76,81,-20,7,-2},
    {-2,7,-20,74,84,-20,7,-2},
    {-1,6,-19,71,86,-20,7,-2},
    {-1,6,-19,69,88,-20,7,-2},
    {-1,6,-19,66,91,-20,7,-2},
    {-2,6,-18,64,93,-20,7,-2},
    {-1,6,-18,61,95,-20,6,-1},
    {-1,6,-17,58,97,-20,6,-1},
    {-1,6,-17,56,99,-20,6,-1},
    {-1,6,-16,53,101,-20,6,-1},
    {-1,5,-16,51,103,-19,6,-1},
    {-1,5,-15,48,105,-19,6,-1},
    {-1,5,-14,45,107,-19,6,-1},
    {-1,5,-14,43,109,-18,5,-1},
    {-1,5,-13,40,111,-18,5,-1},
    {-1,4,-12,38,112,-17,5,-1},
    {-1,4,-12,35,114,-16,5,-1},
    {-1,4,-11,32,116,-16,5,-1},
    {-1,4,-10,30,117,-15,4,-1},
    {-1,3,-9,28,118,-14,4,-1},
    {-1,3,-9,25,120,-13,4,-1},
    {-1,3,-8,22,121,-12,4,-1},
    {-1,3,-7,20,122,-11,3,-1},
    {-1,2,-6,18,123,-10,3,-1},
    {0,2,-6,15,124,-9,3,-1},
    {0,2,-5,13,125,-8,2,-1},
    {0,1,-4,11,125,-7,2,0},
    {0,1,-3,8,126,-6,2,0},
    {0,1,-3,6,127,-4,1,0},
    {0,1,-2,4,127,-3,1,0},
    {0,0,-1,2,128,-1,0,0}};

static int sr_trunc_div(int64_t a, int64_t b) {
    int64_t q = (a < 0 ? -a : a) / (b < 0 ? -b : b);
    return (int)(((a < 0) != (b < 0)) ? -q : q);
}

/* horizontally upscale rows x [>= src_w] stride sstride into
 * dst [rows][dst_w] stride dstride (spec upscale, bit-exact vs
 * superres_ref.upscale_plane: taps past src_w read real mi-area
 * pixels, clamping only at the aligned width aw) */
static void sr_upscale_plane(const pel *src, int sstride, int aw,
                             int rows, int src_w, int dst_w, int bd,
                             pel *dst, int dstride) {
    int x_step = sr_trunc_div(((int64_t)src_w << RS_SUBPEL_BITS)
                              + dst_w / 2, dst_w);
    int64_t err = (int64_t)x_step * dst_w
                  - ((int64_t)src_w << RS_SUBPEL_BITS);
    int x0 = (sr_trunc_div(-((int64_t)(dst_w - src_w)
                             << (RS_SUBPEL_BITS - 1)) + dst_w / 2,
                           dst_w)
              + RS_EXTRA_OFF - sr_trunc_div(err, 2)) & RS_SUBPEL_MASK;
    int mx = (1 << bd) - 1;
    for (int c = 0; c < dst_w; c++) {
        int64_t x_qn = (int64_t)x0 - (1 << RS_SUBPEL_BITS)
                       + (int64_t)c * x_step;
        int base = (int)(x_qn >> RS_SUBPEL_BITS) - 3;
        int phase = (int)((x_qn & RS_SUBPEL_MASK) >> RS_EXTRA_BITS);
        int idx[8];
        for (int k = 0; k < 8; k++) {
            int v = base + k;
            idx[k] = v < 0 ? 0 : (v > aw - 1 ? aw - 1 : v);
        }
        const int16_t *fil = SR_FILTER[phase];
        for (int r = 0; r < rows; r++) {
            const pel *row = src + (int64_t)r * sstride;
            int64_t acc = 0;
            for (int k = 0; k < 8; k++)
                acc += (int64_t)fil[k] * row[idx[k]];
            int64_t v = (acc + (1 << (SR_FILTER_BITS - 1)))
                        >> SR_FILTER_BITS;
            dst[(int64_t)r * dstride + c] =
                (pel)(v < 0 ? 0 : (v > mx ? mx : v));
        }
    }
}
