"""PLAIN codec: raw little-endian fixed-width values.

Decode semantics mirror the reference PLAIN value decoder
(/root/reference/src/Parquet/Stream/Reader.hs:190-209): INT64 = 8-byte
LE (:202-204); we add INT32 = 4-byte LE for the token payload. The
reference's BYTE_ARRAY (u32-LE length prefix + bytes, :195-201) maps to
our string column layout (lengths stream + data blob) in pageformat.py.
"""

from __future__ import annotations

import numpy as np

_DTYPES = {0: np.dtype("<i4"), 1: np.dtype("<i8")}  # value_kind -> dtype


def encode(values: np.ndarray, value_kind: int) -> bytes:
    return np.ascontiguousarray(values.astype(_DTYPES[value_kind], copy=False)).tobytes()


def decode(buf: bytes | memoryview, value_kind: int, n_values: int) -> np.ndarray:
    return np.frombuffer(buf, dtype=_DTYPES[value_kind], count=n_values)
