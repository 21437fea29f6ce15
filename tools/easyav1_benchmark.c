/* Decode benchmark over the easyav1 C API.
 *
 * Methodology parity with the reference benchmark tool
 * (reference tools/easyav1_benchmark.c:79-185): video only, audio
 * disabled, every frame decoded, monotonic wall clock; reports average
 * fps, the realtime multiple (video length / decode time) and the
 * slowest frame.  Re-implemented from scratch against our capi header.
 */

#include <stdio.h>
#include <time.h>

#include "../easyav1_tpu/capi/easyav1.h"

static double now_ms(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec * 1000.0 + ts.tv_nsec / 1e6;
}

int main(int argc, char **argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s file.webm\n", argv[0]);
        return 2;
    }
    easyav1_settings s = easyav1_default_settings();
    s.enable_audio = EASYAV1_FALSE;
    s.skip_unprocessed_frames = EASYAV1_FALSE;
    s.log_level = EASYAV1_LOG_LEVEL_ERROR;

    easyav1_t *av = easyav1_init_from_filename(argv[1], &s);
    if (!av) {
        fprintf(stderr, "failed to open %s\n", argv[1]);
        return 1;
    }
    easyav1_timestamp duration = easyav1_get_duration(av);
    printf("file: %s\n", argv[1]);
    printf("video: %ux%u @ %u fps, %llu ms\n",
           easyav1_get_video_width(av), easyav1_get_video_height(av),
           easyav1_get_video_fps(av), (unsigned long long)duration);

    double start = now_ms();
    double slowest = 0.0;
    uint64_t slowest_frame = 0;
    easyav1_timestamp slowest_ts = 0;
    uint64_t frames = 0;

    while (easyav1_get_status(av) == EASYAV1_STATUS_OK) {
        double t0 = now_ms();
        if (easyav1_decode_next(av) != EASYAV1_STATUS_OK)
            break;
        double el = now_ms() - t0;
        frames = easyav1_get_total_video_frames_processed(av);
        if (el > slowest) {
            slowest = el;
            slowest_frame = frames;
            slowest_ts = easyav1_get_current_timestamp(av);
        }
    }
    double total = now_ms() - start;

    printf("frames decoded: %llu\n", (unsigned long long)frames);
    printf("total time: %.0f ms\n", total);
    printf("average fps: %.2f\n", frames / (total / 1000.0));
    printf("realtime multiple: %.3lfx\n", duration / total);
    printf("slowest frame: #%llu at %llu ms took %.2f ms\n",
           (unsigned long long)slowest_frame,
           (unsigned long long)slowest_ts, slowest);

    easyav1_destroy(&av);
    return 0;
}
