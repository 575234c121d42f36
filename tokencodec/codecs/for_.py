"""Frame-of-reference codec: subtract per-page min, bit-pack deltas.

Not present in the reference (its encodings stop at PLAIN/DICT/RLE,
/root/reference/src/Parquet/Types/Enums.hs:70-79); added per
BASELINE.json north_rule. The reference value is carried in the page
header's ref_value field.
"""

from __future__ import annotations

import numpy as np

from tokencodec.codecs import bitpack


def encode(values: np.ndarray, ref: int, bit_width: int) -> bytes:
    deltas = (values.astype(np.int64, copy=False) - ref).astype(np.uint64)
    return bitpack.pack_le(deltas, bit_width)


def decode(buf: bytes | memoryview, ref: int, bit_width: int, n_values: int) -> np.ndarray:
    deltas = bitpack.unpack_le(buf, bit_width, n_values)
    return deltas.astype(np.int64) + ref
