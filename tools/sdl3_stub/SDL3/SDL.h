/* Minimal SDL3 API surface for COMPILE-CHECKING the player's SDL sink
 * on hosts without SDL3 (`make -C tools player-sdl3-check`, used by
 * tests/test_player.py).  Declarations only — never linked; a real
 * SDL3 install takes precedence via pkg-config in the player-sdl3
 * target.  Shapes follow the public SDL3 headers (zlib license). */
#ifndef SDL3_STUB_H
#define SDL3_STUB_H

#include <stdbool.h>
#include <stdint.h>

typedef uint32_t Uint32;
typedef uint64_t Uint64;
typedef uint8_t Uint8;

typedef struct SDL_Window SDL_Window;
typedef struct SDL_Renderer SDL_Renderer;
typedef struct SDL_Texture SDL_Texture;
typedef struct SDL_AudioStream SDL_AudioStream;
typedef struct SDL_IOStream SDL_IOStream;
typedef uint32_t SDL_PropertiesID;

typedef int SDL_ColorRange;
typedef int SDL_ColorPrimaries;
typedef int SDL_TransferCharacteristics;
typedef int SDL_MatrixCoefficients;
typedef uint32_t SDL_Colorspace;
enum {
    SDL_COLOR_RANGE_LIMITED = 1, SDL_COLOR_RANGE_FULL = 2,
    SDL_COLOR_PRIMARIES_BT709 = 1, SDL_COLOR_PRIMARIES_BT601 = 6,
    SDL_COLOR_PRIMARIES_BT2020 = 9,
    SDL_TRANSFER_CHARACTERISTICS_BT709 = 1,
    SDL_MATRIX_COEFFICIENTS_BT709 = 1,
    SDL_MATRIX_COEFFICIENTS_BT601 = 6,
    SDL_MATRIX_COEFFICIENTS_BT2020_NCL = 9,
    SDL_COLOR_TYPE_YCBCR = 2,
    SDL_CHROMA_LOCATION_LEFT = 1,
};
#define SDL_DEFINE_COLORSPACE(ty, rg, pr, tr, mx, ch) \
    ((SDL_Colorspace)(((ty) << 28) | ((rg) << 24) | ((ch) << 20) | \
                      ((pr) << 10) | ((tr) << 5) | (mx)))

enum {
    SDL_PIXELFORMAT_IYUV = 0x56555949,
    SDL_TEXTUREACCESS_STREAMING = 1,
    SDL_BLENDMODE_BLEND = 1,
    SDL_INIT_AUDIO = 0x10, SDL_INIT_VIDEO = 0x20,
    SDL_WINDOW_FULLSCREEN = 0x1, SDL_WINDOW_RESIZABLE = 0x20,
};
#define SDL_PROP_TEXTURE_CREATE_FORMAT_NUMBER "SDL.texture.create.format"
#define SDL_PROP_TEXTURE_CREATE_ACCESS_NUMBER "SDL.texture.create.access"
#define SDL_PROP_TEXTURE_CREATE_WIDTH_NUMBER "SDL.texture.create.width"
#define SDL_PROP_TEXTURE_CREATE_HEIGHT_NUMBER "SDL.texture.create.height"
#define SDL_PROP_TEXTURE_CREATE_COLORSPACE_NUMBER \
    "SDL.texture.create.colorspace"

typedef struct SDL_FRect { float x, y, w, h; } SDL_FRect;
typedef struct SDL_Rect { int x, y, w, h; } SDL_Rect;

enum {
    SDL_EVENT_QUIT = 0x100,
    SDL_EVENT_KEY_DOWN = 0x300,
    SDL_EVENT_MOUSE_MOTION = 0x400,
    SDL_EVENT_MOUSE_BUTTON_DOWN = 0x401,
    SDL_EVENT_MOUSE_BUTTON_UP = 0x402,
};
enum {
    SDLK_ESCAPE = 27, SDLK_SPACE = 32, SDLK_F = 'f', SDLK_Q = 'q',
    SDLK_RIGHT = 0x4000004f, SDLK_LEFT = 0x40000050,
};
typedef struct SDL_KeyboardEvent { uint32_t type; uint32_t key; }
    SDL_KeyboardEvent;
typedef struct SDL_MouseMotionEvent { uint32_t type; float x, y; }
    SDL_MouseMotionEvent;
typedef struct SDL_MouseButtonEvent { uint32_t type; float x, y; }
    SDL_MouseButtonEvent;
typedef union SDL_Event {
    uint32_t type;
    SDL_KeyboardEvent key;
    SDL_MouseMotionEvent motion;
    SDL_MouseButtonEvent button;
    uint8_t padding[128];
} SDL_Event;

typedef uint16_t SDL_AudioFormat;
#define SDL_AUDIO_F32 0x8120
typedef struct SDL_AudioSpec {
    SDL_AudioFormat format;
    int channels;
    int freq;
} SDL_AudioSpec;
typedef uint32_t SDL_AudioDeviceID;
#define SDL_AUDIO_DEVICE_DEFAULT_PLAYBACK ((SDL_AudioDeviceID)0xFFFFFFFFu)
typedef void (*SDL_AudioStreamCallback)(void *, SDL_AudioStream *, int,
                                        int);

typedef void (*SDL_DialogFileCallback)(void *, const char *const *, int);
typedef struct SDL_DialogFileFilter {
    const char *name;
    const char *pattern;
} SDL_DialogFileFilter;

extern bool SDL_Init(uint32_t flags);
extern void SDL_Quit(void);
extern const char *SDL_GetError(void);
extern SDL_Window *SDL_CreateWindow(const char *, int, int, uint64_t);
extern void SDL_DestroyWindow(SDL_Window *);
extern SDL_Renderer *SDL_CreateRenderer(SDL_Window *, const char *);
extern void SDL_DestroyRenderer(SDL_Renderer *);
extern bool SDL_GetWindowSize(SDL_Window *, int *, int *);
extern uint64_t SDL_GetWindowFlags(SDL_Window *);
extern bool SDL_SetWindowFullscreen(SDL_Window *, bool);
extern SDL_PropertiesID SDL_CreateProperties(void);
extern void SDL_DestroyProperties(SDL_PropertiesID);
extern bool SDL_SetNumberProperty(SDL_PropertiesID, const char *,
                                  int64_t);
extern SDL_Texture *SDL_CreateTextureWithProperties(SDL_Renderer *,
                                                    SDL_PropertiesID);
extern void SDL_DestroyTexture(SDL_Texture *);
extern bool SDL_UpdateYUVTexture(SDL_Texture *, const SDL_Rect *,
                                 const uint8_t *, int, const uint8_t *,
                                 int, const uint8_t *, int);
extern bool SDL_RenderTexture(SDL_Renderer *, SDL_Texture *,
                              const SDL_FRect *, const SDL_FRect *);
extern bool SDL_RenderClear(SDL_Renderer *);
extern bool SDL_RenderPresent(SDL_Renderer *);
extern bool SDL_RenderFillRect(SDL_Renderer *, const SDL_FRect *);
extern bool SDL_SetRenderDrawColor(SDL_Renderer *, uint8_t, uint8_t,
                                   uint8_t, uint8_t);
extern bool SDL_SetRenderDrawBlendMode(SDL_Renderer *, int);
extern bool SDL_PollEvent(SDL_Event *);
extern uint64_t SDL_GetTicks(void);
extern void SDL_Delay(uint32_t);
extern SDL_AudioStream *SDL_OpenAudioDeviceStream(
    SDL_AudioDeviceID, const SDL_AudioSpec *, SDL_AudioStreamCallback,
    void *);
extern bool SDL_ResumeAudioStreamDevice(SDL_AudioStream *);
extern bool SDL_PutAudioStreamData(SDL_AudioStream *, const void *,
                                   int);
extern bool SDL_FlushAudioStream(SDL_AudioStream *);
extern void SDL_DestroyAudioStream(SDL_AudioStream *);
extern void SDL_ShowOpenFileDialog(SDL_DialogFileCallback, void *,
                                   SDL_Window *,
                                   const SDL_DialogFileFilter *, int,
                                   const char *, bool);
extern bool SDL_PumpEvents(void);

#endif /* SDL3_STUB_H */
