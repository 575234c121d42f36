"""Parquet-style RLE / bit-packed hybrid codec — both directions.

Decode grammar matches the reference `decodeRLEBPHybrid`
(/root/reference/src/Parquet/Decoder.hs:119-135):

    while bytes remain:
        header = ULEB128 varint
        if header & 1 == 0:   # RLE run
            run_len = header >> 1
            value   = fixed_width LE int, fixed_width = ((bw-1)//8)+1,
                      0 bytes when bw == 0   (Decoder.hs:102-116)
        else:                 # bit-packed groups
            n_groups = header >> 1            -> n_groups * 8 values,
            bw bits each, LSB-first           (Decoder.hs:83-99)
    truncate output to n_values (final group may be zero-padded).

The encoder (the reference has none — its only encoder is the varint,
Decoder.hs:155-163) guarantees that every *non-final* bit-packed span
is an exact multiple of 8 values, so mid-stream padding never occurs
and decode(encode(x)) is bit-identical.

Run detection and packing are vectorized; the only Python-level loop
is over *emitted spans* (few, by construction of the fast paths).
"""

from __future__ import annotations

import numpy as np

from tokencodec.codecs import bitpack, varint

MIN_RLE_RUN = 8  # runs shorter than this go into bit-packed spans


def _fixed_width(bit_width: int) -> int:
    # mirrors Decoder.hs:111
    return 0 if bit_width == 0 else ((bit_width - 1) // 8) + 1


def find_runs(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized run detection: returns (run_starts, run_lengths)."""
    n = len(values)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.flatnonzero(values[1:] != values[:-1]) + 1
    starts = np.concatenate(([0], change))
    lengths = np.diff(np.concatenate((starts, [n])))
    return starts, lengths


def encode(values: np.ndarray, bit_width: int) -> bytes:
    """Hybrid-encode non-negative ints that all fit in ``bit_width`` bits."""
    n = len(values)
    if n == 0:
        return b""
    values = values.astype(np.uint64, copy=False)
    fw = _fixed_width(bit_width)

    starts, lengths = find_runs(values)

    # fast path: one constant run
    if len(starts) == 1:
        v = int(values[0])
        return varint.encode(n << 1) + v.to_bytes(fw, "little")

    # fast path: no usable runs -> single bit-packed span
    if lengths.max(initial=0) < MIN_RLE_RUN:
        ngroups = (n + 7) // 8
        return varint.encode((ngroups << 1) | 1) + bitpack.pack_le(values, bit_width)

    out: list[bytes] = []
    pending = 0  # start of the not-yet-emitted bit-packed span

    def emit_bp(start: int, count: int) -> None:
        ngroups = (count + 7) // 8
        out.append(varint.encode((ngroups << 1) | 1))
        out.append(bitpack.pack_le(values[start:start + count], bit_width))

    big = lengths >= MIN_RLE_RUN
    for s, ln in zip(starts[big].tolist(), lengths[big].tolist()):
        if s < pending:  # overlapped by an earlier steal
            ln -= pending - s
            s = pending
        gap = s - pending
        steal = (-gap) % 8  # extend preceding span to a multiple of 8
        if ln - steal >= MIN_RLE_RUN:
            if gap + steal:
                emit_bp(pending, gap + steal)
            run_len = ln - steal
            out.append(varint.encode(run_len << 1))
            out.append(int(values[s + steal]).to_bytes(fw, "little"))
            pending = s + ln
    if pending < n:
        emit_bp(pending, n - pending)
    return b"".join(out)


def decode(buf: bytes | memoryview, bit_width: int, n_values: int) -> np.ndarray:
    """Inverse of :func:`encode`; semantics of Decoder.hs:119-135."""
    fw = _fixed_width(bit_width)
    pieces: list[np.ndarray] = []
    got = 0
    pos = 0
    end = len(buf)
    mv = memoryview(buf)
    while got < n_values and pos < end:
        header, pos = varint.decode(mv, pos)
        if header & 1:  # bit-packed groups
            ngroups = header >> 1
            cnt = ngroups * 8
            nbytes = ngroups * bit_width
            pieces.append(bitpack.unpack_le(mv[pos:pos + nbytes], bit_width, cnt))
            pos += nbytes
            got += cnt
        else:  # RLE run
            run_len = header >> 1
            v = int.from_bytes(mv[pos:pos + fw], "little") if fw else 0
            pos += fw
            pieces.append(np.full(run_len, v, dtype=np.uint64))
            got += run_len
    if got < n_values:
        raise ValueError(f"hybrid stream exhausted: {got} < {n_values}")
    result = pieces[0] if len(pieces) == 1 else np.concatenate(pieces)
    return result[:n_values]


def estimate_nbytes(n: int, n_runs: int, run_coverage: int, bit_width: int) -> int:
    """Cheap size estimate used by the codec selector.

    run_coverage = number of values inside runs >= MIN_RLE_RUN.
    """
    fw = _fixed_width(bit_width)
    rle_runs = max(n_runs, 1)
    rle_bytes = rle_runs * (2 + fw)
    bp_values = n - run_coverage
    bp_bytes = bitpack.packed_nbytes(bp_values, bit_width) + 2 * (rle_runs + 1)
    return rle_bytes + bp_bytes
