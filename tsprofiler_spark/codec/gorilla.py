"""Gorilla XOR compression for float64 streams.

Implements the value compression of Facebook's Gorilla TSDB
(Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time Series
Database", VLDB 2015, §4.1.2 — public paper):

* first value stored raw (64 bits);
* each next value XORed with the predecessor;
* XOR == 0  -> control bit '0';
* XOR != 0 and the meaningful bits fit the previous (leading, length)
  block -> '10' + meaningful bits;
* otherwise -> '11' + 5-bit leading-zero count + 6-bit length + bits.

Header: 32-bit count. numpy does the XOR/leading-zero math vectorized;
only token emission walks a Python loop (short per-bucket sequences).
"""

from __future__ import annotations

import numpy as np

from tsprofiler_spark.codec.bits import BitReader, BitWriter, clz64, ctz64

_clz64 = clz64  # shared bit-scan kernels: see codec/bits.py


def gorilla_encode(values: np.ndarray) -> bytes:
    values = np.asarray(values, dtype=np.float64)
    n = len(values)
    w = BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.bytes()

    bits = values.view(np.uint64)
    w.write(int(bits[0]), 64)
    if n == 1:
        return w.bytes()

    xors = bits[1:] ^ bits[:-1]
    lead = np.minimum(_clz64(xors), 31)  # cap like Gorilla (5-bit field)
    # ctz64 reports 64 for xor==0; those entries take the zero-control-bit
    # branch below and never read trail — clamp to 0 to keep the old shape
    trail = np.where(xors != 0, ctz64(xors), 0)

    prev_lead, prev_mbits = -1, -1
    for i in range(len(xors)):
        x = int(xors[i])
        if x == 0:
            w.write(0, 1)
            continue
        l, t = int(lead[i]), int(trail[i])
        mbits = 64 - l - t
        if prev_lead != -1 and l >= prev_lead and l + mbits <= prev_lead + prev_mbits:
            # fits inside the previous block: '10' + prev_mbits bits
            w.write(0b10, 2)
            w.write(x >> (64 - prev_lead - prev_mbits), prev_mbits)
        else:
            w.write(0b11, 2)
            w.write(l, 5)
            w.write(mbits & 0x3F, 6)  # 64 encodes as 0
            w.write(x >> t, mbits)
            prev_lead, prev_mbits = l, mbits
    return w.bytes()


def gorilla_decode(data: bytes) -> np.ndarray:
    r = BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    lead, mbits = 0, 0
    for i in range(1, n):
        ctrl = r.read(1)
        if ctrl == 0:
            out[i] = prev
            continue
        if r.read(1) == 1:
            lead = r.read(5)
            mbits = r.read(6)
            if mbits == 0:
                mbits = 64
        frag = r.read(mbits)
        xor = frag << (64 - lead - mbits)
        prev = prev ^ xor
        out[i] = prev
    return out.view(np.float64)
