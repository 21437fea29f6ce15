/* 16-bit-pel build of the frame reconstruction body (10/12bpc
 * streams; also the plane type the device pipes consume).  Exports
 * keep their plain names, and the pel-independent exports
 * (av1_get_stage_times, av1_lf_grids_export, av1_export_pred_units,
 * av1_save_tmvs, av1_project_mvfield, av1_film_grain, cdef_get_stats)
 * compile only in this unit.  See av1_recon_tmpl.h. */
#define PEL_TYPE uint16_t
#define PEL_BITS 16
#define BDFN(name) name

#include "av1_recon_tmpl.h"
