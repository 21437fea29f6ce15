"""LSb-first bit reader (Vorbis/Ogg bit packing convention).

Behavioral contract: oggpack_read semantics (Vorbis I spec §2; reference
minivorbis.h:303-369) — bits are consumed from each byte starting at the
least-significant bit, bytes in stream order. Reads past the end raise
EndOfPacket (the spec's "end of packet" condition ends packet decode
gracefully, not fatally).
"""

from __future__ import annotations


class EndOfPacket(Exception):
    pass


class BitReader:
    __slots__ = ("_data", "_pos", "_acc", "_nbits", "_len")

    def __init__(self, data: bytes):
        self._data = data
        self._len = len(data)
        self._pos = 0      # next byte index
        self._acc = 0      # bit accumulator, LSb = next bit
        self._nbits = 0

    def read(self, k: int) -> int:
        acc = self._acc
        n = self._nbits
        if n < k:
            data, pos, ln = self._data, self._pos, self._len
            while n < k:
                if pos >= ln:
                    raise EndOfPacket()
                acc |= data[pos] << n
                pos += 1
                n += 8
            self._pos = pos
        self._acc = acc >> k
        self._nbits = n - k
        return acc & ((1 << k) - 1)

    def read1(self) -> int:
        return self.read(1)

    def read_signed(self, k: int) -> int:
        v = self.read(k)
        if v >= 1 << (k - 1):
            v -= 1 << k
        return v

    def bits_consumed(self) -> int:
        return self._pos * 8 - self._nbits

    def remaining_bits(self) -> int:
        return self._len * 8 - self.bits_consumed()


def ilog(x: int) -> int:
    """Vorbis ilog: position of highest set bit; ilog(0) = 0 (spec §9.2.1)."""
    return x.bit_length() if x > 0 else 0


def float32_unpack(x: int) -> float:
    """Vorbis packed float format (spec §9.2.2)."""
    mantissa = x & 0x1FFFFF
    exponent = (x & 0x7FE00000) >> 21
    if x & 0x80000000:
        mantissa = -mantissa
    return mantissa * (2.0 ** (exponent - 788))


def lookup1_values(entries: int, dimensions: int) -> int:
    """Largest integer v with v**dimensions <= entries (spec §9.2.3)."""
    v = int(round(entries ** (1.0 / dimensions)))
    while (v + 1) ** dimensions <= entries:
        v += 1
    while v ** dimensions > entries:
        v -= 1
    return v
