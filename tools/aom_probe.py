#!/usr/bin/env python3
"""Decode an IVF with the system libaom decoder (reference decoder) via
ctypes, printing luma/chroma planes. Used as a second conformance oracle
next to libdav1d when the two disagree with our decoder.

No libaom headers ship in this image, so the decoder ABI version is
brute-forced and the aom_image_t field offsets are self-calibrated by
scanning for the known frame dimensions."""

import ctypes
import struct
import sys

import numpy as np

LIB = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libaom.so.3")
LIB.aom_codec_av1_dx.restype = ctypes.c_void_p
LIB.aom_codec_dec_init_ver.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_void_p, ctypes.c_long,
                                       ctypes.c_int]
LIB.aom_codec_decode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                 ctypes.c_size_t, ctypes.c_void_p]
LIB.aom_codec_get_frame.restype = ctypes.c_void_p
LIB.aom_codec_get_frame.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
LIB.aom_codec_error.restype = ctypes.c_char_p
LIB.aom_codec_error.argtypes = [ctypes.c_void_p]
LIB.aom_codec_error_detail.restype = ctypes.c_char_p
LIB.aom_codec_error_detail.argtypes = [ctypes.c_void_p]


class DecCfg(ctypes.Structure):
    _fields_ = [("threads", ctypes.c_uint), ("w", ctypes.c_uint),
                ("h", ctypes.c_uint), ("allow_lowbitdepth", ctypes.c_uint)]


def decode_ivf(path):
    data = open(path, "rb").read()
    assert data[:4] == b"DKIF"
    hdr_sz = struct.unpack("<H", data[6:8])[0]
    w, h = struct.unpack("<HH", data[12:16])
    nframes = struct.unpack("<I", data[24:28])[0]
    off = hdr_sz
    ctx = ctypes.create_string_buffer(256)
    iface = LIB.aom_codec_av1_dx()
    cfg = DecCfg(1, 0, 0, 1)
    ver = None
    for v in range(1, 40):
        if LIB.aom_codec_dec_init_ver(ctx, iface, ctypes.byref(cfg),
                                      0, v) == 0:
            ver = v
            break
    assert ver is not None, "no working ABI version"
    frames = []
    for _ in range(nframes):
        sz = struct.unpack("<I", data[off:off + 4])[0]
        payload = data[off + 12:off + 12 + sz]
        off += 12 + sz
        rc = LIB.aom_codec_decode(ctx, payload, len(payload), None)
        if rc != 0:
            err = LIB.aom_codec_error(ctx)
            det = LIB.aom_codec_error_detail(ctx)
            print(f"libaom decode error rc={rc}: {err} / {det}",
                  file=sys.stderr)
            return frames, (err, det)
        it = ctypes.c_void_p(None)
        while True:
            img = LIB.aom_codec_get_frame(ctx, ctypes.byref(it))
            if not img:
                break
            frames.append(read_image(img, w, h))
    return frames, None


def read_image(img, w, h):
    # self-calibrate: find (d_w, d_h) = (w, h) as consecutive uint32;
    # planes[3] pointers + stride[3] follow several fields later.
    raw = (ctypes.c_uint * 64).from_address(img)
    dims = [i for i in range(40)
            if raw[i] == w and raw[i + 1] == h and raw[i + 4] == w]
    assert dims, f"cannot locate dims for {w}x{h}: {list(raw[:32])}"
    ptrs = (ctypes.c_void_p * 8).from_address(img)
    # planes[] is the first run of 3 plausible heap pointers after dims
    base = None
    for i in range(3, 24):
        p = (ctypes.c_void_p * 4).from_address(img + i * 8)
        if p[0] and p[1] and p[2] and \
           abs((p[1] or 0) - (p[0] or 0)) < (1 << 32) and \
           abs((p[2] or 0) - (p[1] or 0)) < (1 << 32):
            base = i
            break
    assert base is not None, "cannot locate planes[]"
    planes = (ctypes.c_void_p * 3).from_address(img + base * 8)
    strides = (ctypes.c_int * 3).from_address(img + base * 8 + 24)
    out = []
    cw, ch = (w + 1) // 2, (h + 1) // 2
    for pi, (pw, ph) in enumerate(((w, h), (cw, ch), (cw, ch))):
        st = strides[pi]
        buf = (ctypes.c_ubyte * (st * ph)).from_address(planes[pi])
        arr = np.frombuffer(buf, dtype=np.uint8).reshape(ph, st)[:, :pw]
        out.append(arr.copy())
    return out


if __name__ == "__main__":
    frames, err = decode_ivf(sys.argv[1])
    print(f"decoded {len(frames)} frames, err={err}")
    if frames:
        y = frames[0][0]
        print("luma frame0:")
        print(y if y.shape[0] <= 24 else y[:16, :16])
