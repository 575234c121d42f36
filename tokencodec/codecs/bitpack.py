"""Little-endian bit-packing in groups of 8 values (parquet-style).

Decode semantics match the reference `decodeBPLE`
(/root/reference/src/Parquet/Decoder.hs:83-99): values are packed
LSB-first into a little-endian bit stream, `bit_width` bits each, in
groups of 8 values; a partial final group is zero-padded to the full
8-value group and the decoder truncates back to ``n_values``
(padding golden: /root/reference/tests/unit/Parquet/Decoder/Spec.hs:21-34).

The big-endian deprecated BIT_PACKED variant (`decodeBPBE`,
Decoder.hs:54-80) is provided decode-only for golden-test parity.

Everything here is vectorized numpy — no per-value Python.
"""

from __future__ import annotations

import numpy as np

from tokencodec.codecs import varint


def width_for(max_value: int) -> int:
    """Bits needed for values in [0, max_value]; >=1 matches the level
    bit-width rule ⌊log2(max)⌋+1 (/root/reference/src/Parquet/Stream/Reader.hs:67-70),
    except 0 is allowed for the all-zero case."""
    if max_value < 0:
        raise ValueError("bit-packing requires non-negative values")
    return int(max_value).bit_length()


_BYTE_DTYPES = {8: "<u1", 16: "<u2", 32: "<u4", 64: "<u8"}


def pack_le(values: np.ndarray, bit_width: int) -> bytes:
    """Pack non-negative ints LSB-first, groups of 8, zero padding.

    Memory-bounded vectorized word packing (a handful of O(n) passes,
    no n x bw intermediates — those destroy memory bandwidth when 32
    workers encode concurrently):
      - byte-aligned widths: single dtype cast
      - bw < 8: fold each 8-value group into one <=56-bit word, emit
        its bw little-endian bytes
      - 8 < bw < 64: shift each value to its bit offset and OR the
        spans into the output bytes (offsets are strictly increasing
        per pass when bw > 8, so plain fancy indexing is collision-free)
    """
    n = len(values)
    if bit_width == 0:
        return b""
    if bit_width > 64:
        raise ValueError(f"bit_width {bit_width} > 64")
    ngroups = (n + 7) // 8
    npad = ngroups * 8
    if bit_width in _BYTE_DTYPES:
        out = np.zeros(npad, dtype=np.dtype(_BYTE_DTYPES[bit_width]))
        out[:n] = values
        return out.tobytes()
    padded = np.zeros(npad, dtype=np.uint64)
    padded[:n] = values.astype(np.uint64, copy=False)
    if bit_width < 8:
        u = padded.reshape(ngroups, 8)
        word = np.zeros(ngroups, dtype=np.uint64)
        for j in range(8):
            word |= u[:, j] << np.uint64(j * bit_width)
        out = np.empty((ngroups, bit_width), dtype=np.uint8)
        for k in range(bit_width):
            out[:, k] = (word >> np.uint64(8 * k)).astype(np.uint8)
        return out.tobytes()
    # 8 < bw < 64, not byte-aligned: one 8-value group = exactly bw
    # output bytes; each output byte takes bits from at most 2 adjacent
    # values (value width > byte width), with CONSTANT shifts per byte
    # index — bw vectorized column passes, no scatter.
    u = padded.reshape(ngroups, 8)
    out = np.empty((ngroups, bit_width), dtype=np.uint8)
    for k in range(bit_width):
        bit = 8 * k
        j1 = bit // bit_width
        acc = u[:, j1] >> np.uint64(bit - j1 * bit_width)
        j2 = j1 + 1
        if j2 < 8 and j2 * bit_width < bit + 8:
            acc = acc | (u[:, j2] << np.uint64(j2 * bit_width - bit))
        out[:, k] = acc.astype(np.uint8)
    return out.tobytes()


def unpack_le(buf: bytes | memoryview, bit_width: int, n_values: int) -> np.ndarray:
    """Inverse of :func:`pack_le`; returns uint64 array of n_values."""
    if bit_width == 0:
        return np.zeros(n_values, dtype=np.uint64)
    ngroups = (n_values + 7) // 8
    npad = ngroups * 8
    nbytes = ngroups * bit_width  # 8 values * bw bits / 8 bits-per-byte
    if bit_width in _BYTE_DTYPES:
        raw = np.frombuffer(buf, dtype=np.dtype(_BYTE_DTYPES[bit_width]), count=npad)
        return raw[:n_values].astype(np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8, count=nbytes)
    if bit_width < 8:
        w = raw.reshape(ngroups, bit_width)
        word = np.zeros(ngroups, dtype=np.uint64)
        for k in range(bit_width):
            word |= w[:, k].astype(np.uint64) << np.uint64(8 * k)
        mask = np.uint64((1 << bit_width) - 1)
        vals = np.empty((ngroups, 8), dtype=np.uint64)
        for j in range(8):
            vals[:, j] = (word >> np.uint64(j * bit_width)) & mask
        return vals.reshape(-1)[:n_values]
    # 8 < bw < 64
    # 8 < bw < 64: value j of each group spans bytes with CONSTANT
    # offsets/shifts per lane — 8 vectorized lane passes.
    w = raw.reshape(ngroups, bit_width)
    mask = np.uint64((1 << bit_width) - 1)
    vals = np.empty((ngroups, 8), dtype=np.uint64)
    for j in range(8):
        bit = j * bit_width
        b0 = bit // 8
        r = bit - 8 * b0
        nb = (r + bit_width + 7) // 8
        acc = np.zeros(ngroups, dtype=np.uint64)
        for k in range(min(nb, 8)):
            acc |= w[:, b0 + k].astype(np.uint64) << np.uint64(8 * k)
        acc >>= np.uint64(r)
        if nb > 8:  # 9-byte span (bw > 56): top bits from the 9th byte
            acc |= w[:, b0 + 8].astype(np.uint64) << np.uint64(64 - r)
        vals[:, j] = acc & mask
    return vals.reshape(-1)[:n_values]


def packed_nbytes(n_values: int, bit_width: int) -> int:
    return ((n_values + 7) // 8) * bit_width


def decode_be(buf: bytes, bit_width: int) -> tuple[np.ndarray, bytes]:
    """Deprecated big-endian BIT_PACKED decode, for reference parity only.

    Mirrors `decodeBPBE` (/root/reference/src/Parquet/Decoder.hs:54-80):
    ULEB128 header, run_len = header >> 1, then run_len groups of 8
    values consumed MSB-first. Returns (values, leftover_bytes).
    """
    header, pos = varint.decode(buf, 0)
    run_len = header >> 1
    nbytes = run_len * bit_width
    raw = np.frombuffer(buf, dtype=np.uint8, count=nbytes, offset=pos)
    bits = np.unpackbits(raw, bitorder="big").reshape(-1, bit_width)
    weights = (np.uint64(1) << np.arange(bit_width, dtype=np.uint64))[::-1]
    vals = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)
    return vals, buf[pos + nbytes:]
