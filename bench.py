"""Benchmark entry point (driver-run on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Current headline: full Vorbis decode (host symbol decode + TPU batched
synthesis) realtime multiple, against libvorbis-on-this-host as baseline
(methodology parity: tools/easyav1_benchmark.c realtime-multiple metric).
Switches to AV1 1080p decode fps once the video path is the flagship.
"""

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def bench_vorbis(seconds: float = 30.0) -> dict:
    import numpy as np
    from fixtures import make_fixture, tool
    from easyav1_tpu.container import WebMDemuxer, TrackType
    from easyav1_tpu.audio.vorbis import VorbisDecoder
    from easyav1_tpu.audio.vorbis.device import VorbisDeviceSynth

    fx = make_fixture(frames=0, audio_secs=seconds, channels=2)
    d = WebMDemuxer(str(fx))
    at = d.tracks_of_type(TrackType.AUDIO)[0]
    headers = at.vorbis_headers()
    pkts = []
    while (p := d.read_packet()) is not None:
        if p.track == at.number:
            pkts.extend(p.frames)

    # --- baseline: libvorbis on this host (via the oracle harness) ---
    import hashlib
    import struct

    inp = Path("/tmp/bench_vorbis.pkts")
    outp = Path("/tmp/bench_vorbis.pcm")
    with open(inp, "wb") as f:
        allp = headers + pkts
        f.write(struct.pack("<I", len(allp)))
        for p in allp:
            f.write(struct.pack("<I", len(p)))
            f.write(p)
    t0 = time.perf_counter()
    subprocess.run([str(tool("vorbis_oracle")), str(inp), str(outp)],
                   check=True, capture_output=True)
    t_libvorbis = time.perf_counter() - t0

    # --- ours: host symbols + device synthesis, chunked ---
    dec = VorbisDecoder(headers)
    blocks = [b for b in (dec.decode_packet_symbols(pk) for pk in pkts[:8])
              if b is not None]
    synth = VorbisDeviceSynth(dec.info.channels, dec.info.blocksize0,
                              dec.info.blocksize1,
                              tuple(blocks[0].coupling), chunk=64)
    synth.process(blocks)  # warm up compile
    synth.reset()
    dec = VorbisDecoder(headers)

    t0 = time.perf_counter()
    blocks = [b for b in (dec.decode_packet_symbols(pk) for pk in pkts)
              if b is not None]
    t_symbols = time.perf_counter() - t0
    t1 = time.perf_counter()
    pcm = synth.process(blocks)
    t_synth = time.perf_counter() - t1
    wall = t_symbols + t_synth

    audio_secs = pcm.shape[0] / dec.info.sample_rate
    xrt = audio_secs / wall
    baseline_xrt = audio_secs / t_libvorbis
    return {
        "metric": "vorbis_decode_xrt",
        "value": round(xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / baseline_xrt, 3),
        "baseline_xrt_libvorbis": round(baseline_xrt, 2),
        "symbols_xrt": round(audio_secs / t_symbols, 2),
        "synth_xrt": round(audio_secs / t_synth, 2),
        "audio_secs": round(audio_secs, 2),
    }


def main():
    try:
        from easyav1_tpu.video.av1.backend import AV1Backend  # noqa: F401
        have_av1 = True
    except ImportError:
        have_av1 = False
    # Video bench becomes the headline once the AV1 path exists.
    result = bench_vorbis()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
