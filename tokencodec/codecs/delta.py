"""Delta codec: zigzag(diff) stream through the RLE/bit-packed hybrid.

The reference declares DELTA_BINARY_PACKED but never implements it
(/root/reference/src/Parquet/Types/Enums.hs:75-78); this is our own
design: first value in the page header's ref_value, successive
differences zigzag-mapped to unsigned and fed to the hybrid codec
(rle.py) — sorted/monotone streams collapse to tiny bit widths, and
constant-step streams collapse to pure RLE runs.
"""

from __future__ import annotations

import numpy as np

from tokencodec.codecs import rle


def zigzag(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.int64, copy=False)
    # xor result is a fresh int64 array; reinterpret in place (no copy)
    return ((x << 1) ^ (x >> 63)).view(np.uint64)


def unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64, copy=False)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(u & np.uint64(1)).astype(np.int64)


def prepare(values: np.ndarray) -> tuple[int, np.ndarray, int]:
    """-> (first_value, zigzag diffs, bit_width)."""
    first = int(values[0])
    zz = zigzag(np.diff(values.astype(np.int64, copy=False)))
    bw = int(zz.max(initial=0)).bit_length()
    return first, zz, bw


def encode(values: np.ndarray) -> tuple[bytes, int, int]:
    """-> (payload, ref_value=first, bit_width)."""
    first, zz, bw = prepare(values)
    return rle.encode(zz, bw), first, bw


def decode(buf: bytes | memoryview, first: int, bit_width: int, n_values: int) -> np.ndarray:
    if n_values == 0:
        return np.empty(0, dtype=np.int64)
    out = np.empty(n_values, dtype=np.int64)
    out[0] = first
    if n_values > 1:
        diffs = unzigzag(rle.decode(buf, bit_width, n_values - 1))
        np.cumsum(diffs, out=out[1:])
        out[1:] += first
    return out
