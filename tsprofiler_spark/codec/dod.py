"""Delta-of-delta timestamp compression (Gorilla §4.1.1, VLDB 2015).

Header: 32-bit count + 64-bit first timestamp + 64-bit first delta
(signed; widened from the paper's 14 bits for microsecond epochs, like
the escape range below). Each further timestamp stores dod = (t_i - t_{i-1}) -
(t_{i-1} - t_{i-2}) with the paper's variable ranges:

    '0'                 dod == 0
    '10'   + 7  bits    [-63, 64]
    '110'  + 9  bits    [-255, 256]
    '1110' + 12 bits    [-2047, 2048]
    '1111' + 64 bits    otherwise (we widen the paper's 32 to 64 for
                        microsecond epochs)

Timestamps are int64 (epoch micros or seconds — caller's choice).
"""

from __future__ import annotations

import numpy as np

from tsprofiler_spark.codec.bits import BitReader, BitWriter

_RANGES = ((0b10, 2, 7, 63, 64), (0b110, 3, 9, 255, 256), (0b1110, 4, 12, 2047, 2048))


def dod_encode(ts: np.ndarray) -> bytes:
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    w = BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.bytes()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    if n == 1:
        return w.bytes()
    deltas = np.diff(ts)
    w.write(int(deltas[0]) & ((1 << 64) - 1), 64)
    dods = np.diff(deltas)
    for d in dods:
        d = int(d)
        if d == 0:
            w.write(0, 1)
            continue
        for prefix, plen, bits, lo, hi in _RANGES:
            if -lo <= d <= hi:
                w.write(prefix, plen)
                w.write(d + lo, bits)  # bias to unsigned
                break
        else:
            w.write(0b1111, 4)
            w.write(d & ((1 << 64) - 1), 64)
    return w.bytes()


def dod_decode(data: bytes) -> np.ndarray:
    r = BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    first = r.read(64)
    if first >= 1 << 63:
        first -= 1 << 64
    out[0] = first
    if n == 1:
        return out
    delta = r.read(64)
    if delta >= 1 << 63:
        delta -= 1 << 64
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = r.read(64)
            if dod >= 1 << 63:
                dod -= 1 << 64
        delta += dod
        out[i] = out[i - 1] + delta
    return out
