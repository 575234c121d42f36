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
Decoder.hs:155-163) steals up to 7 head values from each accepted run
so that every non-final bit-packed span is an exact multiple of 8 and
mid-stream padding never occurs. The acceptance walk is a scalar loop
of a few integer ops per candidate run; everything that touches bytes
— headers, run values, one shared pack_le call for all spans, and the
final interleaved assembly — is vectorized, as is decode's value
materialization (one np.repeat for all runs + one unpack_le for all
groups behind a lightweight header walk).
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


def _varint_matrix(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """ULEB128 for a vector of uint (< 2^35): (bytes[k,5], lengths[k])."""
    x = x.astype(np.uint64, copy=False)
    out = np.zeros((len(x), 5), dtype=np.uint8)
    lens = np.ones(len(x), dtype=np.int64)
    rest = x.copy()
    for k in range(5):
        out[:, k] = (rest & np.uint64(0x7F)).astype(np.uint8)
        rest >>= np.uint64(7)
        more = rest > 0
        out[more, k] |= 0x80
        lens[more] = k + 2
    return out, lens


def _scatter(out: np.ndarray, dst_off: np.ndarray, src: np.ndarray,
             src_off: np.ndarray, lens: np.ndarray) -> None:
    """out[dst_off[i]:dst_off[i]+lens[i]] = src[src_off[i]:...] vectorized."""
    total = int(lens.sum())
    if total == 0:
        return
    prefix = np.concatenate(([0], np.cumsum(lens)[:-1]))
    intra = np.arange(total, dtype=np.int64) - np.repeat(prefix, lens)
    out[np.repeat(dst_off, lens) + intra] = src[np.repeat(src_off, lens) + intra]


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

    # acceptance walk: steal <=7 head values from each candidate run so
    # the preceding bit-packed span is a multiple of 8. Only integer
    # bookkeeping happens per run; all byte emission below is vectorized.
    big = lengths >= MIN_RLE_RUN
    cand_s = starts[big].tolist()
    cand_l = lengths[big].tolist()
    acc_a: list[int] = []
    acc_b: list[int] = []
    pending = 0
    for s, ln in zip(cand_s, cand_l):
        steal = (pending - s) % 8
        if ln - steal >= MIN_RLE_RUN:
            acc_a.append(s + steal)
            acc_b.append(s + ln)
            pending = s + ln
    a = np.array(acc_a, dtype=np.int64)
    b = np.array(acc_b, dtype=np.int64)

    # fast path: no usable runs -> single bit-packed span
    if len(a) == 0:
        ngroups = (n + 7) // 8
        return varint.encode((ngroups << 1) | 1) + bitpack.pack_le(values, bit_width)

    run_vals = values[a]
    run_counts = b - a

    # bit-packed spans between/around accepted runs
    bp_s = np.concatenate(([0], b))
    bp_e = np.concatenate((a, [n]))
    bp_len = bp_e - bp_s  # multiples of 8 except possibly the last
    bp_groups = (bp_len + 7) // 8

    # pack every bp value in ONE call (mid spans are 8-aligned so group
    # boundaries coincide with span boundaries)
    nz = bp_len > 0
    total_bp = int(bp_len.sum())
    prefix = np.concatenate(([0], np.cumsum(bp_len)[:-1]))
    gather = np.repeat(bp_s - prefix, bp_len) + np.arange(total_bp, dtype=np.int64)
    packed = np.frombuffer(bitpack.pack_le(values[gather], bit_width), dtype=np.uint8)
    bp_nbytes = bp_groups * bit_width
    bp_src_off = np.concatenate(([0], np.cumsum(bp_nbytes)[:-1]))

    # headers
    rle_hdr, rle_hlen = _varint_matrix(run_counts.astype(np.uint64) << np.uint64(1))
    bp_hdr, bp_hlen = _varint_matrix((bp_groups.astype(np.uint64) << np.uint64(1)) | np.uint64(1))
    bp_hlen = np.where(nz, bp_hlen, 0)
    bp_nbytes = np.where(nz, bp_nbytes, 0)

    # run value bytes: (k, fw) LE
    rv = np.ascontiguousarray(run_vals).view(np.uint8).reshape(len(run_vals), 8)[:, :fw]

    # piece layout: bp0, r0, bp1, r1, ..., r_{k-1}, bp_k
    k = len(a)
    piece_lens = np.zeros(2 * k + 1, dtype=np.int64)
    piece_lens[0::2] = bp_hlen + bp_nbytes
    piece_lens[1::2] = rle_hlen + fw
    out = np.zeros(int(piece_lens.sum()), dtype=np.uint8)
    piece_off = np.concatenate(([0], np.cumsum(piece_lens)[:-1]))
    bp_off = piece_off[0::2]
    rle_off = piece_off[1::2]

    hdr_flat = bp_hdr.reshape(-1)
    _scatter(out, bp_off, hdr_flat, np.arange(k + 1, dtype=np.int64) * 5, bp_hlen)
    _scatter(out, bp_off + bp_hlen, packed, bp_src_off, bp_nbytes)
    hdr_flat_r = rle_hdr.reshape(-1)
    _scatter(out, rle_off, hdr_flat_r, np.arange(k, dtype=np.int64) * 5, rle_hlen)
    _scatter(out, rle_off + rle_hlen, rv.reshape(-1),
             np.arange(k, dtype=np.int64) * fw, np.full(k, fw, dtype=np.int64))
    return out.tobytes()


def decode(buf: bytes | memoryview, bit_width: int, n_values: int) -> np.ndarray:
    """Inverse of :func:`encode`; semantics of Decoder.hs:119-135.

    The header walk is sequential (self-describing stream) but does no
    array work per piece; values materialize in two vectorized passes
    (one np.repeat for all runs, one unpack_le for all groups).
    """
    fw = _fixed_width(bit_width)
    raw = np.frombuffer(buf, dtype=np.uint8)
    pos = 0
    end = len(raw)
    got = 0
    # piece bookkeeping (python scalars only)
    rle_vals: list[int] = []
    rle_counts: list[int] = []
    bp_byte_off: list[int] = []
    bp_counts: list[int] = []
    order: list[tuple[int, int]] = []  # (kind, count)
    rawb = raw.tobytes()
    while got < n_values and pos < end:
        # inlined ULEB128 (same semantics as varint.decode; the call
        # overhead dominates the header walk on run-heavy pages)
        b0 = rawb[pos]
        if b0 < 0x80:
            header = b0
            pos += 1
        else:
            header = b0 & 0x7F
            shift = 7
            pos += 1
            while True:
                b0 = rawb[pos]
                pos += 1
                header |= (b0 & 0x7F) << shift
                if not (b0 & 0x80):
                    break
                shift += 7
        if header & 1:
            ngroups = header >> 1
            cnt = ngroups * 8
            order.append((1, cnt))
            bp_byte_off.append(pos)
            bp_counts.append(cnt)
            pos += ngroups * bit_width
            got += cnt
        else:
            run_len = header >> 1
            v = int.from_bytes(rawb[pos:pos + fw], "little") if fw else 0
            pos += fw
            order.append((0, run_len))
            rle_vals.append(v)
            rle_counts.append(run_len)
            got += run_len
    if got < n_values:
        raise ValueError(f"hybrid stream exhausted: {got} < {n_values}")

    # vectorized materialization
    rle_stream = (np.repeat(np.array(rle_vals, dtype=np.uint64),
                            np.array(rle_counts, dtype=np.int64))
                  if rle_vals else np.empty(0, np.uint64))
    if bp_byte_off:
        offs = np.array(bp_byte_off, dtype=np.int64)
        cnts = np.array(bp_counts, dtype=np.int64)
        nbytes = (cnts // 8) * bit_width
        prefix = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
        gather = np.repeat(offs - prefix, nbytes) + np.arange(int(nbytes.sum()), dtype=np.int64)
        bp_stream = bitpack.unpack_le(np.ascontiguousarray(raw[gather]).tobytes(),
                                      bit_width, int(cnts.sum()))
    else:
        bp_stream = np.empty(0, np.uint64)

    # interleave both streams into output order with two vectorized scatters
    kinds = np.array([o[0] for o in order], dtype=np.int64)
    cnts_all = np.array([o[1] for o in order], dtype=np.int64)
    dst_off = np.concatenate(([0], np.cumsum(cnts_all)[:-1]))
    out = np.empty(got, dtype=np.uint64)
    for kind, stream in ((0, rle_stream), (1, bp_stream)):
        m = kinds == kind
        if not m.any():
            continue
        lens = cnts_all[m]
        doff = dst_off[m]
        total = int(lens.sum())
        prefix = np.concatenate(([0], np.cumsum(lens)[:-1]))
        intra = np.arange(total, dtype=np.int64) - np.repeat(prefix, lens)
        out[np.repeat(doff, lens) + intra] = stream[:total]
    return out[:n_values]


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
