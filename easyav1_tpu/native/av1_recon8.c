/* 8-bit-pel build of the frame reconstruction body: planes are uint8,
 * halving pixel memory traffic through MC/intra/LF/CDEF/LR/pack for
 * 8bpc streams (the bandwidth-bound common case).  Exports carry an
 * `_8` suffix (av1_recon_frame_8, av1_pack8_8); the ctypes wrapper
 * dispatches on stream bitdepth.  Mirrors dav1d's two-bitdepth
 * template build (cmake/dav1d.cmake:1320-1352). */
#define PEL_TYPE uint8_t
#define PEL_BITS 8
#define BDFN(name) name##_8

#include "av1_recon_tmpl.h"
