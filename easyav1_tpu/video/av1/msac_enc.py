"""msac (daala range coder) encoder — libaom od_ec_enc layout.

Two uses: (1) conformance verification of the decoder — re-encoding the
decoded symbol sequence must reproduce the original tile bytes; the
first divergence localizes a misdecoded symbol; (2) crafting test
bitstreams.
"""

from __future__ import annotations

from typing import List

EC_PROB_SHIFT = 6
EC_MIN_PROB = 4


def _ilog(x: int) -> int:
    return x.bit_length()


class MsacEncoder:
    def __init__(self):
        self.low = 0
        self.rng = 0x8000
        self.cnt = -9
        self.precarry: List[int] = []

    def _normalize(self, low: int, rng: int) -> None:
        c = self.cnt
        d = 16 - _ilog(rng)
        s = c + d
        if s >= 0:
            c += 16
            m = (1 << c) - 1
            if s >= 8:
                self.precarry.append((low >> c) & 0xFFFF)
                low &= m
                c -= 8
                m >>= 8
            self.precarry.append((low >> c) & 0xFFFF)
            s = c + d - 24
            low &= m
        self.low = (low << d) & 0xFFFFFFFF
        self.rng = (rng << d) & 0xFFFF
        self.cnt = s

    def encode_q15(self, fl: int, fh: int, s: int, nsyms_minus_1: int) -> None:
        """fl = icdf[s-1] (32768 for s==0), fh = icdf[s]."""
        r = self.rng
        low = self.low
        assert 32768 <= r
        if fl < 32768:
            u = ((r >> 8) * (fl >> EC_PROB_SHIFT) >> (7 - EC_PROB_SHIFT)) \
                + EC_MIN_PROB * (nsyms_minus_1 - (s - 1))
            v = ((r >> 8) * (fh >> EC_PROB_SHIFT) >> (7 - EC_PROB_SHIFT)) \
                + EC_MIN_PROB * (nsyms_minus_1 - s)
            low += r - u
            r = u - v
        else:
            v = ((r >> 8) * (fh >> EC_PROB_SHIFT) >> (7 - EC_PROB_SHIFT)) \
                + EC_MIN_PROB * (nsyms_minus_1 - s)
            r -= v
        self._normalize(low, r)

    def encode_symbol(self, cdf: List[int], symbol: int) -> None:
        n = len(cdf) - 1  # number of symbols (row has count slot)
        fl = 32768 if symbol == 0 else cdf[symbol - 1]
        fh = cdf[symbol]
        self.encode_q15(fl, fh, symbol, n - 1)

    def encode_bool(self, bit: int, f: int) -> None:
        """f: icdf probability (matches Msac.decode_bool)."""
        r = self.rng
        low = self.low
        v = ((r >> 8) * (f >> EC_PROB_SHIFT) >> (7 - EC_PROB_SHIFT)) \
            + EC_MIN_PROB
        if bit:
            low += r - v
            r = v
        else:
            r -= v
        self._normalize(low, r)

    def encode_bool_equi(self, bit: int) -> None:
        r = self.rng
        low = self.low
        v = ((r >> 8) << 7) + EC_MIN_PROB
        if bit:
            low += r - v
            r = v
        else:
            r -= v
        self._normalize(low, r)

    def encode_literal(self, value: int, bits: int) -> None:
        for b in range(bits - 1, -1, -1):
            self.encode_bool_equi((value >> b) & 1)

    def encode_ns(self, v: int, n: int) -> None:
        """Inverse of Msac._decode_ns (spec NS(n))."""
        w = n.bit_length()
        m = (1 << w) - n
        if v < m:
            if w > 1:
                self.encode_literal(v, w - 1)
            return
        x = v + m          # (v' << 1) - m + extra = v  ->  v + m = 2*v' + extra
        if w > 1:
            self.encode_literal(x >> 1, w - 1)
        self.encode_bool_equi(x & 1)

    def done(self) -> bytes:
        """od_ec_enc_done: round low up, emit, resolve carries."""
        l = self.low
        c = self.cnt
        s = 10
        m = 0x3FFF
        e = ((l + m) & ~m) | (m + 1)
        s += c
        out = list(self.precarry)
        if s > 0:
            n = (1 << (c + 16)) - 1
            while True:
                out.append((e >> (c + 16)) & 0xFFFF)
                e &= n
                s -= 8
                c -= 8
                n >>= 8
                if s <= 0:
                    break
        # carry resolution
        buf = bytearray()
        carry = 0
        data = []
        for v in reversed(out):
            v += carry
            carry = v >> 8
            data.append(v & 0xFF)
        data.reverse()
        return bytes(data)
