"""AV1 multi-symbol adaptive arithmetic (range) decoder — spec §8.2.

Python reference implementation; the production hot path is the C port in
native/ (SURVEY.md §2d: msac "stays on CPU", it is the Amdahl bottleneck
and must be tight native code).

Conventions: CDFs are stored in the inverse convention (icdf[i] =
32768 - P(symbol <= i) * 32768) as N+1 uint16 entries — N-1 decreasing
probability boundaries, a zero terminator, and an adaptation counter in
the last slot. EC_PROB_SHIFT=6, EC_MIN_PROB=4.
"""

from __future__ import annotations

EC_PROB_SHIFT = 6
EC_MIN_PROB = 4


def _floor_log2(x: int) -> int:
    return x.bit_length() - 1


class Msac:
    __slots__ = ("data", "bit_pos", "max_bits", "rng", "value",
                 "allow_update_cdf")

    def __init__(self, data: bytes, allow_update_cdf: bool = True):
        self.data = data
        sz = len(data)
        num_bits = min(sz * 8, 15)
        buf = self._read_bits_raw(0, num_bits)
        self.bit_pos = num_bits
        padded = buf << (15 - num_bits)
        self.value = ((1 << 15) - 1) ^ padded
        self.rng = 1 << 15
        self.max_bits = sz * 8 - 15
        self.allow_update_cdf = allow_update_cdf

    def _read_bits_raw(self, pos: int, n: int) -> int:
        """n bits MSB-first starting at bit pos; bits past the end are 0."""
        if n == 0:
            return 0
        data = self.data
        out = 0
        for i in range(n):
            p = pos + i
            byte = data[p >> 3] if (p >> 3) < len(data) else 0
            out = (out << 1) | ((byte >> (7 - (p & 7))) & 1)
        return out

    # ------------------------------------------------------------------

    def _renorm(self, rng: int, value: int) -> None:
        bits = 15 - _floor_log2(rng)
        rng <<= bits
        num_bits = min(bits, max(0, self.max_bits))
        new_data = self._read_bits_raw(self.bit_pos, num_bits)
        self.bit_pos += num_bits
        padded = new_data << (bits - num_bits)
        self.value = padded ^ (((value + 1) << bits) - 1)
        self.max_bits -= bits
        self.rng = rng

    def decode_symbol(self, cdf) -> int:
        """cdf: mutable uint16 sequence of N+1 entries (see module doc).
        Returns the decoded symbol and adapts the cdf in place."""
        n = len(cdf) - 1  # number of symbols
        rng = self.rng
        value = self.value
        cur = rng
        symbol = -1
        r8 = rng >> 8
        while True:
            symbol += 1
            prev = cur
            f = cdf[symbol]
            cur = (r8 * (f >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)
            cur += EC_MIN_PROB * (n - 1 - symbol)
            if value >= cur:
                break
        self._renorm(prev - cur, value - cur)
        if self.allow_update_cdf:
            count = cdf[n]
            rate = 3 + (count > 15) + (count > 31) + min(_floor_log2(n), 2)
            for i in range(n - 1):
                if i >= symbol:
                    cdf[i] -= cdf[i] >> rate
                else:
                    cdf[i] += (32768 - cdf[i]) >> rate
            cdf[n] = count + (count < 32)
        return symbol

    def decode_bool(self, f: int) -> int:
        """Boolean with fixed probability f (q15, icdf convention —
        P(bit==1) corresponds to the low region). No adaptation."""
        rng = self.rng
        value = self.value
        cur = (((rng >> 8) * (f >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) \
            + EC_MIN_PROB
        if value >= cur:
            self._renorm(rng - cur, value - cur)
            return 0
        self._renorm(cur, value)
        return 1

    def decode_bool_adapt(self, cdf) -> int:
        """Adaptive boolean: cdf = [f, 0(unused), count]."""
        rng = self.rng
        value = self.value
        cur = (((rng >> 8) * (cdf[0] >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) \
            + EC_MIN_PROB
        if value >= cur:
            bit = 0
            self._renorm(rng - cur, value - cur)
        else:
            bit = 1
            self._renorm(cur, value)
        if self.allow_update_cdf:
            count = cdf[2]
            rate = 3 + (count > 15) + (count > 31)
            if bit:
                cdf[0] += (32768 - cdf[0]) >> rate
            else:
                cdf[0] -= cdf[0] >> rate
            cdf[2] = count + (count < 32)
        return bit

    def decode_bool_equi(self) -> int:
        rng = self.rng
        value = self.value
        cur = ((rng >> 8) << 7) + EC_MIN_PROB
        if value >= cur:
            self._renorm(rng - cur, value - cur)
            return 0
        self._renorm(cur, value)
        return 1

    def decode_literal(self, n: int) -> int:
        """n equiprobable bits, MSB first (spec L(n))."""
        x = 0
        for _ in range(n):
            x = (x << 1) | self.decode_bool_equi()
        return x

    def decode_subexp(self, num_syms: int, k: int = 3) -> int:
        """Spec §9.2.5 decode_subexp using literal bits."""
        i = 0
        mk = 0
        while True:
            b2 = k + i - 1 if i else k
            a = 1 << b2
            if num_syms <= mk + 3 * a:
                return self._decode_ns(num_syms - mk) + mk
            if self.decode_bool_equi():
                i += 1
                mk += a
            else:
                return self.decode_literal(b2) + mk

    def _decode_ns(self, n: int) -> int:
        w = n.bit_length()
        m = (1 << w) - n
        v = self.decode_literal(w - 1) if w > 1 else 0
        if v < m:
            return v
        extra = self.decode_bool_equi()
        return (v << 1) - m + extra

    def decode_unsigned_subexp_with_ref(self, mx: int, r: int,
                                        k: int = 3) -> int:
        v = self.decode_subexp(mx, k)
        if (r << 1) <= mx:
            return _inverse_recenter(r, v)
        return mx - 1 - _inverse_recenter(mx - 1 - r, v)

    def decode_signed_subexp_with_ref(self, low: int, high: int, r: int,
                                      k: int = 3) -> int:
        return self.decode_unsigned_subexp_with_ref(high - low, r - low,
                                                    k) + low

    def decode_golomb(self) -> int:
        """Exp-Golomb for coefficient base_range overflow (spec §5.11.x
        read_golomb)."""
        length = 0
        while not self.decode_bool_equi():
            length += 1
            if length > 31:
                break
        x = 1
        for _ in range(min(length, 31)):
            x = (x << 1) | self.decode_bool_equi()
        return x - 1


def _inverse_recenter(r: int, v: int) -> int:
    # spec 4.10.x / dav1d inv_recenter: odd v steps BELOW the ref
    if v > 2 * r:
        return v
    if v & 1:
        return r - ((v + 1) >> 1)
    return r + (v >> 1)
