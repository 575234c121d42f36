"""Nested-list column codec: arbitrary-depth list<...<int64>> with
nulls at every level.

This is our columnar equivalent of the reference's Dremel machinery —
where parquet-hs decodes repetition/definition levels and replays
instruction sets to rebuild nested records
(/root/reference/src/Parquet/Reader.hs:369-407,461-537,637-705 and
Stream/Reader.hs:237-282), we store what Arrow stores natively: one
validity bitmap + one offsets stream per nesting level, plus the leaf
values — each encoded as an ordinary int page (offsets delta-encode to
~0 bits; validity is RLE-friendly 0/1). Decode rebuilds the exact
Arrow array bottom-up with `pa.Array.from_buffers`. The worked level
tables in the reference (Reader.hs:43-131, INTERNAL.md:24-101) are
covered by the golden round-trip test of its own `input1.json` fixture
(tests/test_nested.py).

Layout (envelope codec NESTED, kind INT64):
    u8 depth
    per level (outermost first):
        u32 len | validity int page (0/1 per slot)
        u32 len | lengths  int page (list length per slot; 0 for null)
    leaf:
        u32 len | validity int page
        u32 len | values   int page (nulls stored as 0)
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tokencodec import codecs, pageformat

NESTED_CODEC = 10
codecs.CODEC_NAMES.setdefault(NESTED_CODEC, "nested")


def _gather_positions(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    total = int(lens.sum())
    prefix = np.concatenate(([0], np.cumsum(lens)[:-1]))
    return np.repeat(starts - prefix, lens) + np.arange(total, dtype=np.int64)


def _sub(page: bytes) -> bytes:
    return struct.pack("<I", len(page)) + page


def encode_nested_page(arr: pa.Array) -> bytes:
    """Encode a (possibly chunked) list<...<int64>> array, nulls anywhere."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n_top = len(arr)
    parts: list[bytes] = []
    depth = 0
    cur = arr
    while pa.types.is_list(cur.type) or pa.types.is_large_list(cur.type):
        valid = np.asarray(cur.is_valid())
        offsets = np.asarray(cur.offsets, dtype=np.int64)
        lengths = np.diff(offsets)
        lengths[~valid] = 0  # canonical: null list == empty slice
        starts = offsets[:-1]
        pos = _gather_positions(starts, lengths)
        cur = cur.values.take(pa.array(pos)) if len(pos) else cur.values.slice(0, 0)
        parts.append(_sub(pageformat.encode_int_page(valid.astype(np.int64), pageformat.KIND_INT32)))
        parts.append(_sub(pageformat.encode_int_page(lengths, pageformat.KIND_INT64)))
        depth += 1
    leaf_valid = np.asarray(cur.is_valid()) if len(cur) else np.zeros(0, bool)
    leaf_vals = np.asarray(cur.fill_null(0), dtype=np.int64) if len(cur) else np.zeros(0, np.int64)
    parts.append(_sub(pageformat.encode_int_page(leaf_valid.astype(np.int64), pageformat.KIND_INT32)))
    parts.append(_sub(pageformat.encode_int_page(leaf_vals, pageformat.KIND_INT64)))
    payload = bytes([depth]) + b"".join(parts)
    return pageformat._wrap(NESTED_CODEC, pageformat.KIND_INT64, 0, n_top,
                            0, 0, payload)


def _validity_buffer(valid: np.ndarray) -> pa.Buffer | None:
    if valid.all():
        return None
    return pa.py_buffer(np.packbits(valid.astype(np.uint8), bitorder="little"))


def decode_nested_page(buf: bytes | memoryview) -> pa.Array:
    h = pageformat.read_header(buf)
    if h["codec"] != NESTED_CODEC:
        raise ValueError("not a nested page")
    mv = memoryview(buf)[pageformat.HEADER_SIZE:pageformat.HEADER_SIZE + h["payload_len"]]
    depth = mv[0]
    p = 1

    def take() -> np.ndarray:
        nonlocal p
        (ln,) = struct.unpack_from("<I", mv, p)
        out = pageformat.decode_int_page(mv[p + 4:p + 4 + ln])
        p += 4 + ln
        return np.asarray(out, dtype=np.int64)

    levels = [(take().astype(bool), take()) for _ in range(depth)]
    leaf_valid = take().astype(bool)
    leaf_vals = take()

    arr = pa.Array.from_buffers(
        pa.int64(), len(leaf_vals),
        [_validity_buffer(leaf_valid), pa.py_buffer(leaf_vals)])
    for valid, lengths in reversed(levels):
        offsets = np.zeros(len(lengths) + 1, dtype=np.int32)
        np.cumsum(lengths, out=offsets[1:])
        arr = pa.Array.from_buffers(
            pa.list_(arr.type), len(lengths),
            [_validity_buffer(valid), pa.py_buffer(offsets)],
            children=[arr])
    return arr
