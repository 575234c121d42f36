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


def pack_le(values: np.ndarray, bit_width: int) -> bytes:
    """Pack non-negative ints LSB-first, groups of 8, zero padding."""
    n = len(values)
    if bit_width == 0:
        return b""
    if bit_width > 64:
        raise ValueError(f"bit_width {bit_width} > 64")
    ngroups = (n + 7) // 8
    padded = np.zeros(ngroups * 8, dtype=np.uint64)
    padded[:n] = values.astype(np.uint64, copy=False)
    # bit matrix: row per value, bit_width little-endian bits per row
    shifts = np.arange(bit_width, dtype=np.uint64)
    bits = ((padded[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def unpack_le(buf: bytes | memoryview, bit_width: int, n_values: int) -> np.ndarray:
    """Inverse of :func:`pack_le`; returns uint64 array of n_values."""
    if bit_width == 0:
        return np.zeros(n_values, dtype=np.uint64)
    ngroups = (n_values + 7) // 8
    nbytes = ngroups * bit_width  # 8 values * bw bits / 8 bits-per-byte
    raw = np.frombuffer(buf, dtype=np.uint8, count=nbytes)
    bits = np.unpackbits(raw, bitorder="little").reshape(-1, bit_width)
    weights = (np.uint64(1) << np.arange(bit_width, dtype=np.uint64))
    vals = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)
    return vals[:n_values]


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
