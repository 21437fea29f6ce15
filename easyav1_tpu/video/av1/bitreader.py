"""AV1 MSB-first bit reader (AV1 spec §4: f(n), uvlc, le(n), leb128,
su(n), ns(n) descriptors)."""

from __future__ import annotations


class AV1BitstreamError(Exception):
    pass


class BitReader:
    __slots__ = ("data", "pos", "_len")

    def __init__(self, data: bytes, start_bit: int = 0):
        self.data = data
        self.pos = start_bit  # bit position
        self._len = len(data) * 8

    def f(self, n: int) -> int:
        """Read n bits MSB-first."""
        pos = self.pos
        if pos + n > self._len:
            raise AV1BitstreamError("read past end")
        self.pos = pos + n
        data = self.data
        v = 0
        # byte-at-a-time assembly
        first_byte = pos >> 3
        last_byte = (pos + n - 1) >> 3
        chunk = int.from_bytes(data[first_byte:last_byte + 1], "big")
        total_bits = (last_byte - first_byte + 1) * 8
        shift = total_bits - (pos & 7) - n
        return (chunk >> shift) & ((1 << n) - 1)

    def f1(self) -> int:
        return self.f(1)

    def uvlc(self) -> int:
        leading_zeros = 0
        while not self.f(1):
            leading_zeros += 1
            if leading_zeros > 32:
                raise AV1BitstreamError("uvlc too long")
        if leading_zeros >= 32:
            return (1 << 32) - 1
        return self.f(leading_zeros) + (1 << leading_zeros) - 1 if leading_zeros else 0

    def le(self, n_bytes: int) -> int:
        """Little-endian byte-aligned integer."""
        assert self.pos % 8 == 0
        v = int.from_bytes(
            self.data[self.pos // 8:self.pos // 8 + n_bytes], "little")
        self.pos += 8 * n_bytes
        return v

    def leb128(self) -> int:
        value = 0
        for i in range(8):
            b = self.f(8)
            value |= (b & 0x7F) << (i * 7)
            if not (b & 0x80):
                break
        return value

    def su(self, n: int) -> int:
        """Signed: n-1 magnitude bits + sign handling per spec su(n)."""
        value = self.f(n)
        sign_mask = 1 << (n - 1)
        if value & sign_mask:
            value -= 2 * sign_mask
        return value

    def ns(self, n: int) -> int:
        """Non-symmetric unsigned encoding."""
        w = n.bit_length()
        m = (1 << w) - n
        v = self.f(w - 1)
        if v < m:
            return v
        extra = self.f(1)
        return (v << 1) - m + extra

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def bits_left(self) -> int:
        return self._len - self.pos
