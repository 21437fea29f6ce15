/* Player UI core: bitmap font, animated time-bar state machine and
 * play/pause icon morph — pure C, no SDL dependency, so both the
 * terminal and SDL3 sinks compile it and the test suite drives it
 * headless (render-to-canvas + hash).
 *
 * Reference parity: tools/easyav1_player.c font overlay (:36-49),
 * time-bar open/close animation (:922-1054) and the play/pause morph
 * (:1056-1120).  Fresh implementation: own 5x7 glyph set, fractional
 * state machine, trapezoid morph rasterizer. */

#ifndef PLAYER_UI_H
#define PLAYER_UI_H

#include <stdint.h>
#include <string.h>

#define UI_FONT_W 5
#define UI_FONT_H 7

/* own 5x7 glyphs, bit i = column i (LSB = leftmost) */
static const uint8_t UI_FONT_DIGITS[10][UI_FONT_H] = {
    {0x0E, 0x11, 0x19, 0x15, 0x13, 0x11, 0x0E},   /* 0 */
    {0x04, 0x06, 0x04, 0x04, 0x04, 0x04, 0x0E},   /* 1 */
    {0x0E, 0x11, 0x10, 0x0C, 0x02, 0x01, 0x1F},   /* 2 */
    {0x0E, 0x11, 0x10, 0x0C, 0x10, 0x11, 0x0E},   /* 3 */
    {0x08, 0x0C, 0x0A, 0x09, 0x1F, 0x08, 0x08},   /* 4 */
    {0x1F, 0x01, 0x0F, 0x10, 0x10, 0x11, 0x0E},   /* 5 */
    {0x0E, 0x01, 0x0F, 0x11, 0x11, 0x11, 0x0E},   /* 6 */
    {0x1F, 0x10, 0x08, 0x04, 0x02, 0x02, 0x02},   /* 7 */
    {0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E},   /* 8 */
    {0x0E, 0x11, 0x11, 0x1E, 0x10, 0x11, 0x0E},   /* 9 */
};
static const uint8_t UI_FONT_COLON[UI_FONT_H] =
    {0x00, 0x04, 0x04, 0x00, 0x04, 0x04, 0x00};
static const uint8_t UI_FONT_SLASH[UI_FONT_H] =
    {0x10, 0x08, 0x08, 0x04, 0x02, 0x02, 0x01};

static const uint8_t *ui_glyph(char ch)
{
    if (ch >= '0' && ch <= '9') return UI_FONT_DIGITS[ch - '0'];
    if (ch == ':') return UI_FONT_COLON;
    if (ch == '/') return UI_FONT_SLASH;
    return NULL;                         /* space / unknown: blank */
}

/* rasterize `text` into a u8 canvas; returns advance in pixels */
static int ui_draw_text(uint8_t *canvas, int stride, int W, int H,
                        int x, int y, int scale, const char *text,
                        uint8_t val)
{
    int cx = x;
    for (const char *p = text; *p; p++) {
        const uint8_t *g = ui_glyph(*p);
        if (g) {
            for (int r = 0; r < UI_FONT_H; r++)
                for (int c = 0; c < UI_FONT_W; c++) {
                    if (!((g[r] >> c) & 1)) continue;
                    for (int sy = 0; sy < scale; sy++)
                        for (int sx = 0; sx < scale; sx++) {
                            int px = cx + c * scale + sx;
                            int py = y + r * scale + sy;
                            if (px >= 0 && px < W && py >= 0 && py < H)
                                canvas[py * stride + px] = val;
                        }
                }
        }
        cx += (UI_FONT_W + 1) * scale;
    }
    return cx - x;
}

/* "M:SS" or "H:MM:SS" like the reference overlay */
static void ui_fmt_time(uint64_t ms, char *out /* >= 16 */)
{
    uint64_t s = ms / 1000;
    unsigned hh = (unsigned)(s / 3600), mm = (unsigned)(s / 60 % 60),
             ss = (unsigned)(s % 60);
    if (hh) {
        out[0] = (char)('0' + hh % 10);
        out[1] = ':';
        out[2] = (char)('0' + mm / 10);
        out[3] = (char)('0' + mm % 10);
        out[4] = ':';
        out[5] = (char)('0' + ss / 10);
        out[6] = (char)('0' + ss % 10);
        out[7] = 0;
    } else {
        out[0] = (char)('0' + mm / 10);
        out[1] = (char)('0' + mm % 10);
        out[2] = ':';
        out[3] = (char)('0' + ss / 10);
        out[4] = (char)('0' + ss % 10);
        out[5] = 0;
    }
}

/* ---- time-bar state machine ---------------------------------------- */

typedef enum {
    UI_TB_HIDDEN = 0,
    UI_TB_OPENING,
    UI_TB_OPEN,
    UI_TB_CLOSING
} ui_tb_state;

#define UI_TB_OPEN_MS 200
#define UI_TB_CLOSE_MS 300
#define UI_TB_IDLE_MS 2500

typedef struct {
    ui_tb_state st;
    uint64_t t0;             /* state entry time */
    uint64_t last_activity;
    float pos;               /* 0 hidden .. 1 fully shown */
} ui_timebar;

/* advance the bar; activity = pointer moved/clicked this tick, hold =
 * keep open regardless of idle (paused or scrubbing).  Returns pos. */
static float ui_timebar_step(ui_timebar *tb, uint64_t now, int activity,
                             int hold)
{
    if (activity) tb->last_activity = now;
    switch (tb->st) {
    case UI_TB_HIDDEN:
        tb->pos = 0.f;
        if (activity) { tb->st = UI_TB_OPENING; tb->t0 = now; }
        break;
    case UI_TB_OPENING:
        tb->pos = (float)(now - tb->t0) / UI_TB_OPEN_MS;
        if (tb->pos >= 1.f) { tb->pos = 1.f; tb->st = UI_TB_OPEN; }
        break;
    case UI_TB_OPEN:
        tb->pos = 1.f;
        if (!hold && now - tb->last_activity >= UI_TB_IDLE_MS) {
            tb->st = UI_TB_CLOSING;
            tb->t0 = now;
        }
        break;
    case UI_TB_CLOSING:
        tb->pos = 1.f - (float)(now - tb->t0) / UI_TB_CLOSE_MS;
        if (activity || hold) {
            /* reopen from the current position */
            tb->st = UI_TB_OPENING;
            tb->t0 = now - (uint64_t)(tb->pos * UI_TB_OPEN_MS);
        } else if (tb->pos <= 0.f) {
            tb->pos = 0.f;
            tb->st = UI_TB_HIDDEN;
        }
        break;
    }
    return tb->pos;
}

/* ---- play/pause morph ---------------------------------------------- */

/* t = 0: play triangle; t = 1: pause bars.  The icon is two vertical
 * trapezoids (left/right half of the triangle morphing into the two
 * pause bars); each quad is {x0, ytop0, ybot0, x1, ytop1, ybot1}. */
typedef struct { float x0, yt0, yb0, x1, yt1, yb1; } ui_quad;

static void ui_play_morph(float t, float cx, float cy, float size,
                          ui_quad *left, ui_quad *right)
{
    float h = size, w = size * 0.866f;   /* triangle width */
    float x0 = cx - w / 2, x1 = cx + w / 2;
    float barw = size * 0.28f, gap = size * 0.16f;
    /* play: left half spans [x0, cx]; tops converge linearly toward
       the apex at x1.  pause: two bars, full height. */
    float lx0 = x0 + (cx - gap / 2 - barw - x0) * t;
    float lx1 = (x0 + w / 2) + (cx - gap / 2 - (x0 + w / 2)) * t;
    float mid_t = cy - h / 4, mid_b = cy + h / 4;   /* triangle mid */
    left->x0 = lx0;
    left->yt0 = cy - h / 2;
    left->yb0 = cy + h / 2;
    left->x1 = lx1;
    left->yt1 = mid_t + (cy - h / 2 - mid_t) * t;
    left->yb1 = mid_b + (cy + h / 2 - mid_b) * t;
    float rx0 = (x0 + w / 2) + (cx + gap / 2 - (x0 + w / 2)) * t;
    float rx1 = x1 + (cx + gap / 2 + barw - x1) * t;
    right->x0 = rx0;
    right->yt0 = mid_t + (cy - h / 2 - mid_t) * t;
    right->yb0 = mid_b + (cy + h / 2 - mid_b) * t;
    right->x1 = rx1;
    right->yt1 = cy + (cy - h / 2 - cy) * t;
    right->yb1 = cy + (cy + h / 2 - cy) * t;
}

/* rasterize a vertical-edged trapezoid into the canvas (selftest +
 * terminal preview; the SDL sink renders with per-column rects) */
static void ui_fill_quad(uint8_t *canvas, int stride, int W, int H,
                         const ui_quad *q, uint8_t val)
{
    int xa = (int)(q->x0 + 0.5f), xb = (int)(q->x1 + 0.5f);
    if (xb <= xa) xb = xa + 1;
    for (int x = xa; x < xb; x++) {
        float f = (float)(x - xa) / (float)(xb - xa);
        int yt = (int)(q->yt0 + (q->yt1 - q->yt0) * f + 0.5f);
        int yb = (int)(q->yb0 + (q->yb1 - q->yb0) * f + 0.5f);
        for (int y = yt; y < yb; y++)
            if (x >= 0 && x < W && y >= 0 && y < H)
                canvas[y * stride + x] = val;
    }
}

/* ---- headless selftest: scripted timeline -> canvas hash ----------- */

static uint32_t ui_selftest(char *trace, int trace_cap)
{
    enum { W = 320, H = 48 };
    static uint8_t canvas[W * H];
    memset(canvas, 0, sizeof(canvas));
    ui_timebar tb;
    memset(&tb, 0, sizeof(tb));
    int tp = 0;
    /* timeline: idle, activity at 100ms, idle past close, reopen */
    static const struct { uint64_t t; int act; int hold; } SCRIPT[] = {
        {0, 0, 0},    {50, 0, 0},   {100, 1, 0},  {200, 0, 0},
        {320, 0, 0},  {1000, 0, 0}, {2700, 0, 0}, {2800, 0, 0},
        {2900, 0, 0}, {3000, 1, 0}, {3100, 0, 1}, {9000, 0, 1},
    };
    for (unsigned i = 0; i < sizeof(SCRIPT) / sizeof(SCRIPT[0]); i++) {
        float pos = ui_timebar_step(&tb, SCRIPT[i].t, SCRIPT[i].act,
                                    SCRIPT[i].hold);
        if (tp < trace_cap - 8) {
            trace[tp++] = (char)('0' + (int)tb.st);
            trace[tp++] = (char)('0' + (int)(pos * 9.0f + 0.5f));
            trace[tp++] = ' ';
        }
    }
    trace[tp] = 0;
    char ts[16], ds[16];
    ui_fmt_time(754000, ts);             /* 12:34 */
    ui_fmt_time(3367000, ds);            /* 56:07 -> 0:56:07 */
    char line[40];
    int n = 0;
    for (const char *p = ts; *p; p++) line[n++] = *p;
    line[n++] = ' '; line[n++] = '/'; line[n++] = ' ';
    for (const char *p = ds; *p; p++) line[n++] = *p;
    line[n] = 0;
    ui_draw_text(canvas, W, W, H, 40, 8, 2, line, 255);
    ui_quad l, r;
    ui_play_morph(0.0f, 16, 24, 20, &l, &r);
    ui_fill_quad(canvas, W, W, H, &l, 200);
    ui_fill_quad(canvas, W, W, H, &r, 200);
    ui_play_morph(0.5f, 260, 24, 20, &l, &r);
    ui_fill_quad(canvas, W, W, H, &l, 210);
    ui_fill_quad(canvas, W, W, H, &r, 210);
    ui_play_morph(1.0f, 300, 24, 20, &l, &r);
    ui_fill_quad(canvas, W, W, H, &l, 220);
    ui_fill_quad(canvas, W, W, H, &r, 220);
    uint32_t hsh = 2166136261u;
    for (int i = 0; i < W * H; i++)
        hsh = (hsh ^ canvas[i]) * 16777619u;
    return hsh;
}

#endif /* PLAYER_UI_H */
