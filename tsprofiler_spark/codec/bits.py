"""Minimal bit-level writer/reader used by the Gorilla and DoD codecs.

Runs inside Arrow-batched pandas UDFs on per-group point arrays (a tier
bucket's points), so sequences are short; numpy handles the word-level
math, Python only walks the emitted tokens.
"""

from __future__ import annotations


class BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, width: int) -> None:
        """Append the low `width` bits of `value` (MSB first)."""
        self.acc = (self.acc << width) | (value & ((1 << width) - 1))
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bytes(self) -> bytes:
        out = bytearray(self.buf)
        if self.nbits:
            out.append((self.acc << (8 - self.nbits)) & 0xFF)
        return bytes(out)


class BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, width: int) -> int:
        out = 0
        remaining = width
        while remaining > 0:
            byte_idx, bit_idx = divmod(self.pos, 8)
            take = min(8 - bit_idx, remaining)
            chunk = self.data[byte_idx]
            chunk >>= 8 - bit_idx - take
            chunk &= (1 << take) - 1
            out = (out << take) | chunk
            self.pos += take
            remaining -= take
        return out


def clz64(x):
    """Vectorized count-leading-zeros over uint64 (64 for zero inputs).

    Shared by the scalar and batch Gorilla encoders — their bitstreams must
    stay byte-identical, so there is exactly one bit-scan implementation.
    """
    import numpy as np

    out = np.full(x.shape, 64, dtype=np.int64)
    nz = x != 0
    shifted = x[nz]
    pos = np.zeros(shifted.shape, dtype=np.int64)
    for width in (32, 16, 8, 4, 2, 1):
        mask = shifted >= (np.uint64(1) << np.uint64(width))
        pos[mask] += width
        shifted = np.where(mask, shifted >> np.uint64(width), shifted)
    out[nz] = 63 - pos
    return out


def ctz64(x):
    """Vectorized count-trailing-zeros over uint64 (64 for zero inputs)."""
    import numpy as np

    out = np.full(x.shape, 64, dtype=np.int64)
    nz = x != 0
    v = x[nz]
    t = np.zeros(v.shape, dtype=np.int64)
    for width in (32, 16, 8, 4, 2, 1):
        mask = (v & ((np.uint64(1) << np.uint64(width)) - np.uint64(1))) == 0
        t[mask] += width
        v = np.where(mask, v >> np.uint64(width), v)
    out[nz] = t
    return out
