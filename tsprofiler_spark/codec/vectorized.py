"""Batch-vectorized Gorilla / delta-of-delta encoders.

The scalar codecs in `gorilla.py` / `dod.py` walk a Python loop per token;
inside the Arrow-batched compress UDF that loop is the hot path (tens of
millions of points per run). These variants encode EVERY segment of an
Arrow batch in one numpy pass:

1. concatenate all segments' points into one flat array + a lengths array;
2. compute each token's class and bit-width vectorized;
3. compute every token's absolute bit offset with a segmented exclusive
   prefix-sum (each segment's stream is independently byte-aligned);
4. scatter token bits into one global 0/1 array (a ≤68-iteration loop of
   whole-batch vectorized stores — loop length is BIT WIDTH, not points);
5. one `np.packbits`, then split the byte buffer at segment boundaries.

`dod_encode_many` is bit-identical to `dod.dod_encode` per segment (the
class choice per delta-of-delta is independent, so the exact paper format
vectorizes; asserted in tests/test_codec.py). `gorilla_encode_many` keeps
the Gorilla bitstream grammar but fixes the (leading, meaningful) block
once per segment — min leading / min trailing zeros over the segment's
XORs — so every token is '0', one '11' (block definition), or '10'
(block reuse): the sequential prev-block dependency disappears and the
stream stays decodable by the unmodified `gorilla.gorilla_decode`.
Compression is within ~1 control-bit/token of the adaptive scalar policy
on rolled-up series (values in a segment are similar) and the ratio
bound in tests still holds.
"""

from __future__ import annotations

import numpy as np

_U1 = np.uint64(1)


_CHUNK_ELEMS = 1 << 23  # bound the (tokens × width) bit-matrix to ~8M cells


def _scatter_fixed(bits: np.ndarray, offsets: np.ndarray, values: np.ndarray, width: int) -> None:
    """Write `width`-bit values (MSB first) at absolute bit `offsets`.

    One broadcast builds the (k × width) 0/1 matrix and one fancy-index
    store lands it — the work is proportional to output BITS, not
    width × batch. Token bit-ranges within a call never overlap, so a
    plain (buffered) fancy assignment is safe. Chunked to bound the
    temporary matrix."""
    k = len(offsets)
    if k == 0 or width == 0:
        return
    values = values.astype(np.uint64, copy=False)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    cols = np.arange(width, dtype=np.int64)
    step = max(1, _CHUNK_ELEMS // width)
    for s in range(0, k, step):
        v = values[s : s + step]
        o = offsets[s : s + step]
        mat = ((v[:, None] >> shifts[None, :]) & _U1).astype(np.uint8)
        idx = (o[:, None] + cols[None, :]).ravel()
        bits[idx] = mat.ravel()


def _scatter_var(bits: np.ndarray, offsets: np.ndarray, values: np.ndarray, widths: np.ndarray) -> None:
    """Write per-token variable-width values (MSB first). Widths here are
    per-SEGMENT constants (≤64 distinct values in a batch), so group by
    width and reuse the mask-free fixed-width scatter per group."""
    if len(offsets) == 0:
        return
    values = values.astype(np.uint64, copy=False)
    order = np.argsort(widths, kind="stable")
    sw = widths[order]
    bounds = np.concatenate([[0], np.nonzero(np.diff(sw))[0] + 1, [len(sw)]])
    for b0, b1 in zip(bounds[:-1], bounds[1:]):
        idx = order[b0:b1]
        _scatter_fixed(bits, offsets[idx], values[idx], int(sw[b0]))


def _segment_layout(lengths: np.ndarray):
    """Common index bookkeeping: per-element segment ids and positions."""
    lengths = np.asarray(lengths, dtype=np.int64)
    n_seg = len(lengths)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]]) if n_seg else np.zeros(0, np.int64)
    sid = np.repeat(np.arange(n_seg), lengths)
    pos = np.arange(int(lengths.sum()), dtype=np.int64) - np.repeat(starts, lengths)
    return lengths, n_seg, starts, sid, pos


def _finish(bits: np.ndarray, seg_byte_start: np.ndarray, seg_bytes: np.ndarray) -> list[bytes]:
    packed = np.packbits(bits)
    buf = packed.tobytes()
    return [
        buf[int(s) : int(s + b)] for s, b in zip(seg_byte_start, seg_bytes)
    ]


def dod_encode_many(ts_concat: np.ndarray, lengths: np.ndarray) -> list[bytes]:
    """Per-segment delta-of-delta blobs, bit-identical to `dod.dod_encode`.

    ``ts_concat``: int64 timestamps of all segments concatenated;
    ``lengths``: points per segment. Returns one bytes blob per segment.
    """
    ts = np.asarray(ts_concat, dtype=np.int64)
    lengths, n_seg, starts, sid, pos = _segment_layout(lengths)
    if n_seg == 0:
        return []
    uts = ts.view(np.uint64)

    # delta-of-delta tokens exist for pos >= 2
    is_dod = pos >= 2
    d_idx = np.nonzero(is_dod)[0]
    dods = (ts[d_idx] - ts[d_idx - 1]) - (ts[d_idx - 1] - ts[d_idx - 2]) if len(d_idx) else np.zeros(0, np.int64)

    # classes and widths (same ranges/order as dod._RANGES)
    c0 = dods == 0
    c1 = ~c0 & (dods >= -63) & (dods <= 64)
    c2 = ~c0 & ~c1 & (dods >= -255) & (dods <= 256)
    c3 = ~c0 & ~c1 & ~c2 & (dods >= -2047) & (dods <= 2048)
    c4 = ~(c0 | c1 | c2 | c3)
    w = np.ones(len(dods), dtype=np.int64)
    w[c1], w[c2], w[c3], w[c4] = 9, 12, 16, 68

    # per-segment header bits + per-segment total size, byte aligned
    header_bits = 32 + np.where(lengths >= 1, 64, 0) + np.where(lengths >= 2, 64, 0)
    dod_bits_per_seg = np.zeros(n_seg, dtype=np.int64)
    if len(d_idx):
        np.add.at(dod_bits_per_seg, sid[d_idx], w)
    total_bits = header_bits + dod_bits_per_seg
    seg_bytes = (total_bits + 7) // 8
    seg_byte_start = np.concatenate([[0], np.cumsum(seg_bytes)[:-1]])
    seg_bit_start = seg_byte_start * 8

    bits = np.zeros(int(seg_bytes.sum()) * 8, dtype=np.uint8)

    # headers: count, first ts, first delta
    _scatter_fixed(bits, seg_bit_start, lengths.astype(np.uint64), 32)
    has1 = lengths >= 1
    _scatter_fixed(bits, seg_bit_start[has1] + 32, uts[starts[has1]], 64)
    has2 = lengths >= 2
    first_delta = (ts[starts[has2] + 1] - ts[starts[has2]]).view(np.uint64) if has2.any() else np.zeros(0, np.uint64)
    _scatter_fixed(bits, seg_bit_start[has2] + 96, first_delta, 64)

    if len(d_idx):
        # within-segment exclusive prefix sum of widths
        excl = np.cumsum(w) - w
        first_dod_of_seg = np.zeros(n_seg, dtype=np.int64)
        seg_of_dod = sid[d_idx]
        # excl value at each segment's first dod token
        firsts = np.unique(seg_of_dod, return_index=True)[1]
        base = np.zeros(n_seg, dtype=np.int64)
        base[seg_of_dod[firsts]] = excl[firsts]
        del first_dod_of_seg
        within = excl - base[seg_of_dod]
        off = seg_bit_start[seg_of_dod] + header_bits[seg_of_dod] + within

        udods = dods.view(np.uint64)
        # c0: single '0' bit — already zero-initialized
        _scatter_fixed(bits, off[c1], ((np.uint64(0b10) << np.uint64(7)) | (dods[c1] + 63).astype(np.uint64)), 9)
        _scatter_fixed(bits, off[c2], ((np.uint64(0b110) << np.uint64(9)) | (dods[c2] + 255).astype(np.uint64)), 12)
        _scatter_fixed(bits, off[c3], ((np.uint64(0b1110) << np.uint64(12)) | (dods[c3] + 2047).astype(np.uint64)), 16)
        _scatter_fixed(bits, off[c4], np.full(int(c4.sum()), 0b1111, dtype=np.uint64), 4)
        _scatter_fixed(bits, off[c4] + 4, udods[c4], 64)

    return _finish(bits, seg_byte_start, seg_bytes)


# shared bit-scan kernels: see codec/bits.py (bit-identity between the
# scalar and batch encoders depends on these being the same implementation)
from tsprofiler_spark.codec.bits import clz64 as _clz64_v  # noqa: E402
from tsprofiler_spark.codec.bits import ctz64 as _ctz64_v  # noqa: E402


def gorilla_encode_many(
    vals_concat: np.ndarray, lengths: np.ndarray, run_len: int = 32
) -> list[bytes]:
    """Per-segment Gorilla blobs, decodable by the unmodified
    `gorilla.gorilla_decode`.

    Block policy: within each segment, tokens are grouped into runs of
    ``run_len``; each run fixes ONE (lead, mbits) block = (min lead, min
    trail) over the run's nonzero XORs, announced by a '11' token at the
    run's first nonzero XOR and reused by '10' tokens for the rest of the
    run. Blocks only ever change at '11' tokens, so the stream grammar is
    exactly Gorilla's; the run granularity keeps blocks tight on smooth
    series (within a few % of the adaptive scalar policy) while every
    quantity — classes, widths, offsets — vectorizes with no sequential
    state."""
    vals = np.asarray(vals_concat, dtype=np.float64)
    lengths, n_seg, starts, sid, pos = _segment_layout(lengths)
    if n_seg == 0:
        return []
    u = vals.view(np.uint64)

    # xor vs predecessor (only meaningful for pos >= 1)
    xor = np.zeros(len(u), dtype=np.uint64)
    if len(u) > 1:
        xor[1:] = u[1:] ^ u[:-1]
    xor[pos == 0] = 0

    tokens = pos >= 1  # every non-first element emits one token
    nz = tokens & (xor != 0)

    # run ids: (segment, (pos-1) // run_len) flattened to a dense int key
    max_runs = (int(lengths.max()) + run_len - 1) // run_len + 1 if n_seg else 1
    rid = sid * max_runs + np.maximum(pos - 1, 0) // run_len
    n_rid = n_seg * max_runs

    # per-run block: min lead (capped 31) / min trail over nonzero xors
    lead_i = np.minimum(_clz64_v(xor), 31)
    trail_i = _ctz64_v(xor)
    lead_blk = np.full(n_rid, 64, dtype=np.int64)
    trail_blk = np.full(n_rid, 64, dtype=np.int64)
    if nz.any():
        np.minimum.at(lead_blk, rid[nz], lead_i[nz])
        np.minimum.at(trail_blk, rid[nz], trail_i[nz])
    mbits_blk = 64 - lead_blk - trail_blk  # >=1 wherever a nonzero xor exists

    # first nonzero-xor token per RUN emits the '11' block definition
    first_nz = np.zeros(len(u), dtype=bool)
    if nz.any():
        nz_idx = np.nonzero(nz)[0]
        run_of_nz = rid[nz_idx]
        # nz_idx is sorted; a run's first nz is where the run id changes
        newrun = np.ones(len(nz_idx), dtype=bool)
        newrun[1:] = run_of_nz[1:] != run_of_nz[:-1]
        first_nz[nz_idx[newrun]] = True
    other_nz = nz & ~first_nz

    widths = np.zeros(len(u), dtype=np.int64)
    widths[pos == 0] = 64
    widths[tokens & ~nz] = 1
    widths[first_nz] = 13 + mbits_blk[rid[first_nz]]
    widths[other_nz] = 2 + mbits_blk[rid[other_nz]]
    # count only emitted tokens (pos==0 raw + others); width array already
    # holds 0 for nothing — every element emits exactly one token here.

    header_bits = np.full(n_seg, 32, dtype=np.int64)
    tok_bits_per_seg = np.zeros(n_seg, dtype=np.int64)
    np.add.at(tok_bits_per_seg, sid, widths)
    total_bits = header_bits + tok_bits_per_seg
    seg_bytes = (total_bits + 7) // 8
    seg_byte_start = np.concatenate([[0], np.cumsum(seg_bytes)[:-1]])
    seg_bit_start = seg_byte_start * 8

    bits = np.zeros(int(seg_bytes.sum()) * 8, dtype=np.uint8)
    _scatter_fixed(bits, seg_bit_start, lengths.astype(np.uint64), 32)

    # absolute bit offset per element token: segmented exclusive prefix sum
    excl = np.cumsum(widths) - widths
    # widths excl at each segment's first element (empty segments have none)
    base = np.zeros(n_seg, dtype=np.int64)
    nonempty = lengths > 0
    base[nonempty] = excl[starts[nonempty]]
    off = seg_bit_start[sid] + 32 + (excl - base[sid])

    # raw first values
    f = pos == 0
    _scatter_fixed(bits, off[f], u[f], 64)

    # zero-xor tokens: single '0' bit — already zero.

    if nz.any():
        mb = mbits_blk[rid]
        tb = trail_blk[rid]
        payload = np.zeros(len(u), dtype=np.uint64)
        payload[nz] = xor[nz] >> tb[nz].astype(np.uint64)  # tb<=63 wherever nz

        # '11' + 5-bit lead + 6-bit mbits (64 -> 0), then payload
        meta = (
            (np.uint64(0b11) << np.uint64(11))
            | (lead_blk[rid[first_nz]].astype(np.uint64) << np.uint64(6))
            | (mbits_blk[rid[first_nz]].astype(np.uint64) & np.uint64(0x3F))
        )
        _scatter_fixed(bits, off[first_nz], meta, 13)
        _scatter_var(bits, off[first_nz] + 13, payload[first_nz], mb[first_nz])

        # '10' + payload
        _scatter_fixed(bits, off[other_nz], np.full(int(other_nz.sum()), 0b10, dtype=np.uint64), 2)
        _scatter_var(bits, off[other_nz] + 2, payload[other_nz], mb[other_nz])

    return _finish(bits, seg_byte_start, seg_bytes)
