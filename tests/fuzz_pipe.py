"""Device-pipe feature-mix fuzzer.

Random synth intra frames mixing palette blocks, directional/smooth/
paeth intra, random coefficients (and, on intrabc seeds, DV copy
blocks), decoded three ways per seed: libdav1d (oracle), the native C
path, and the EASYAV1_PIPE=pallas device path — all three must agree
bit-exactly and the device path must not fall back to C.  Guards the
round-5 device-pipe features (palette literal units, cls-11 intrabc,
the scan/strip executors) against layout interactions the targeted
tests don't reach.

    python tests/fuzz_pipe.py 0 50
"""

import os
import random
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from easyav1_tpu.video.av1 import constants as C  # noqa: E402
from av1_synth import (EncBlock, dav1d_decode_ivf, encode_frame,  # noqa: E402
                       make_ivf, my_decode_tu)
from fuzz_av1 import rand_block, rand_coeffs  # noqa: E402


def _pal_block(rng, r, c, bsize):
    n = rng.randint(2, 8)
    # consecutive deltas must fit bd-1 bits (the encoder's color-delta
    # coding, av1_enc._emit_palette_colors): build by bounded gaps
    base = rng.randint(5, 60)
    colors = [base]
    for _ in range(n - 1):
        colors.append(min(colors[-1] + rng.randint(2, 24), 255))
    colors = sorted(set(colors))
    while len(colors) < n:
        cand = rng.randint(5, 250)
        if all(abs(cand - cc) > 1 for cc in colors) \
                and min(abs(cand - cc) for cc in colors) < 100:
            colors = sorted(set(colors + [cand]))
    n = len(colors)
    h4, w4 = C.BLOCK_H4[bsize], C.BLOCK_W4[bsize]
    g = np.random.default_rng(rng.randint(0, 1 << 30))
    m = g.integers(0, n, size=(h4 * 4, w4 * 4)).astype(np.int32)
    skip = rng.random() < 0.5
    return EncBlock(r=r, c=c, bsize=bsize, skip=skip,
                    palette_y=(colors, m),
                    luma_coeffs=None if skip
                    else [rand_coeffs(rng, 4, allow_golomb=False)])


def _frame_blocks(rng):
    """16x16-mi (64x64 px) frame: random quad layout, some cells
    palette."""
    blocks = []
    for r in range(0, 16, 4):
        for c in range(0, 16, 4):
            if rng.random() < 0.35:
                blocks.append(_pal_block(rng, r, c, C.BLOCK_16X16))
            else:
                blocks.extend(rand_block(rng, r, c, 4,
                                         tx_select=False))
    return blocks


def _decode_three_ways(tu, w, h, tag):
    from easyav1_tpu import native

    dav = dav1d_decode_ivf(make_ivf([tu], w, h), tag)[0]
    os.environ["EASYAV1_PIPE"] = "native"
    nat = my_decode_tu(tu)
    native._PIPE_STATS.update(frames=0, fallbacks=0)
    os.environ["EASYAV1_PIPE"] = "pallas"
    try:
        dev = my_decode_tu(tu)
    finally:
        os.environ["EASYAV1_PIPE"] = "native"
    assert native._PIPE_STATS["fallbacks"] == 0, f"{tag}: pipe fell back"
    bad = 0
    for p in ("y", "u", "v"):
        bad = max(bad,
                  int(np.abs(dav[p].astype(int)
                             - nat[p].astype(int)).max()),
                  int(np.abs(dav[p].astype(int)
                             - dev[p].astype(int)).max()))
    return bad


def run_seed(seed, verbose=False):
    rng = random.Random(seed)
    if seed % 4 == 3:
        # intrabc layout seeds ride the dedicated generator
        import test_av1_intrabc as TI

        TI.run_case(seed, n_bc=rng.randint(4, 12),
                    sizes=(C.BLOCK_8X8, C.BLOCK_16X16, C.BLOCK_32X32))
        # run_case already asserts dav1d parity for the native path;
        # repeat through the pipe
        from easyav1_tpu import native

        os.environ["EASYAV1_PIPE"] = "pallas"
        native._PIPE_STATS.update(frames=0, fallbacks=0)
        try:
            TI.run_case(seed, n_bc=rng.randint(4, 12),
                        sizes=(C.BLOCK_8X8, C.BLOCK_16X16,
                               C.BLOCK_32X32))
        finally:
            os.environ["EASYAV1_PIPE"] = "native"
        assert native._PIPE_STATS["fallbacks"] == 0
        return True
    q = rng.choice([20, 60, 120, 200])
    blocks = _frame_blocks(rng)
    tu = encode_frame(64, 64, q, blocks, adapt=True, screen=True)
    bad = _decode_three_ways(tu, 64, 64, f"pipe_fuzz{seed}")
    if verbose or bad:
        print(f"seed {seed}: q={q} blocks={len(blocks)} -> "
              f"{'OK' if not bad else f'DIFF {bad}'}")
    return bad == 0


if __name__ == "__main__":
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    fails = []
    for s in range(lo, hi):
        try:
            if not run_seed(s):
                fails.append(s)
        except Exception as e:
            print(f"seed {s}: EXC {str(e)[:100]}")
            fails.append(s)
    print(f"{hi - lo} seeds, {len(fails)} failures: {fails[:20]}")


def test_fuzz_pipe_smoke():
    """Suite-tier slice of the pipe fuzzer (palette/intrabc/intra
    feature mixes, three-way bit-exact, zero fallbacks)."""
    for s in range(8):
        assert run_seed(s), f"seed {s}"
