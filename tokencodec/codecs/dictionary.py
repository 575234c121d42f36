"""Dictionary codec: unique-value dictionary + hybrid-encoded indices.

Decode semantics mirror the reference PLAIN_DICTIONARY data-page path
(/root/reference/src/Parquet/Stream/Reader.hs:148-182): a 1-byte index
bit width, then an RLE/bit-packed hybrid stream of dictionary indices;
values are reconstructed by dictionary lookup (`construct_dict_values`,
Stream/Reader.hs:101-109). The dictionary page itself holds PLAIN
values in the reference (`dictPageReader`, Stream/Reader.hs:211-220);
here the dictionary is delta-encoded (np.unique output is sorted, so
deltas are small) — strictly smaller, same information.

Encode (absent in the reference) is `np.unique(return_inverse=True)`
plus the hybrid index encoder — fully vectorized.

Payload layout:
    varint dict_size
    varint dict_bytes_len | dict payload (delta codec over sorted uniques)
    u8 index_bit_width    | hybrid index stream
"""

from __future__ import annotations

import numpy as np

from tokencodec.codecs import bitpack, delta, rle, varint


def encode(values: np.ndarray) -> tuple[bytes, int]:
    """-> (payload, dict_size). Values: any int64-safe integers."""
    uniq, inverse = np.unique(values, return_inverse=True)
    dict_size = len(uniq)
    dict_payload, first, dbw = delta.encode(uniq.astype(np.int64))
    ibw = bitpack.width_for(dict_size - 1)
    idx_payload = rle.encode(inverse.astype(np.uint64), ibw)
    out = b"".join([
        varint.encode(dict_size),
        varint.encode(len(dict_payload)),
        int(first).to_bytes(8, "little", signed=True),
        bytes([dbw]),
        dict_payload,
        bytes([ibw]),
        idx_payload,
    ])
    return out, dict_size


def decode(buf: bytes | memoryview, n_values: int) -> np.ndarray:
    mv = memoryview(buf)
    dict_size, pos = varint.decode(mv, 0)
    dlen, pos = varint.decode(mv, pos)
    first = int.from_bytes(mv[pos:pos + 8], "little", signed=True)
    pos += 8
    dbw = mv[pos]
    pos += 1
    uniq = delta.decode(mv[pos:pos + dlen], first, dbw, dict_size)
    pos += dlen
    ibw = mv[pos]
    pos += 1
    idx = rle.decode(mv[pos:], ibw, n_values).astype(np.int64)
    return uniq[idx]
