"""Nested column codec: arbitrary trees of list / large_list / struct
over int64 leaves, with nulls at every level.

This is our columnar equivalent of the reference's Dremel machinery —
where parquet-hs decodes repetition/definition levels and replays
instruction sets to rebuild nested records, including arbitrary object
trees (/root/reference/src/Parquet/Reader.hs:369-407,461-537,637-705
and Stream/Reader.hs:237-282), we store what Arrow stores natively: one
validity bitmap (+ one lengths stream for lists) per node, plus the
leaf values — each encoded as an ordinary int page (lengths
delta-encode to ~0 bits; validity is RLE-friendly 0/1). Decode rebuilds
the exact Arrow array bottom-up with `pa.Array.from_buffers`, bit- and
type-identical: list vs large_list is recorded per node and rebuilt
with int32 vs int64 offsets respectively, so a large_list input never
silently round-trips to a narrower type. The worked level tables in the
reference (Reader.hs:43-131, INTERNAL.md:24-101) are covered by the
golden round-trip test of its own `input1.json` fixture
(tests/test_nested.py); its object assembly (`IObjectField`,
ParquetObject.hs:54-62) maps to the struct nodes here.

Layout (envelope codec NESTED, kind INT64) — a recursive node tree:

    node := kind u8
        kind 0 (leaf int64):  sub(validity) sub(values)
        kind 1 (list):        sub(validity) sub(lengths) node(child)
        kind 2 (large_list):  sub(validity) sub(lengths) node(child)
        kind 3 (struct):      sub(validity) u8 n_children
                              { u16 name_len | name utf8 | node(child) }*
        kind 4-7 (leaf string | large_string | binary | large_binary):
                              sub(validity) sub(string page)
        kind 8 (leaf bool):   sub(validity) sub(values 0/1)
        kind 9/10 (leaf float32 | float64):
                              sub(validity) sub(float page — bit-exact
                              ALP / byte-shuffle, pageformat)
    sub  := u32 len | int page (or string/float page per leaf kind)

String/binary leaves reuse the flat string-page layout (dict/FSST/plain
auto-selection, pageformat.encode_string_page) — BYTE_ARRAY-anywhere
parity with the reference's decodeValue
(/root/reference/src/Parquet/Stream/Reader.hs:190-209) and its object
assembly of string fields (ParquetObject.hs:54-62).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from tokencodec import codecs, pageformat

NESTED_CODEC = 10
codecs.CODEC_NAMES.setdefault(NESTED_CODEC, "nested")

_LEAF, _LIST, _LARGE_LIST, _STRUCT = 0, 1, 2, 3
_STR, _LARGE_STR, _BIN, _LARGE_BIN, _BOOL = 4, 5, 6, 7, 8
_F32, _F64 = 9, 10
_BYTES_KIND = {_STR: pa.string(), _LARGE_STR: pa.large_string(),
               _BIN: pa.binary(), _LARGE_BIN: pa.large_binary()}
_FLOAT_KIND = {_F32: (pa.float32(), np.float32), _F64: (pa.float64(), np.float64)}


def _gather_positions(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    total = int(lens.sum())
    prefix = np.concatenate(([0], np.cumsum(lens)[:-1]))
    return np.repeat(starts - prefix, lens) + np.arange(total, dtype=np.int64)


def _sub(page: bytes) -> bytes:
    return struct.pack("<I", len(page)) + page


def _enc_ints(values: np.ndarray, kind: int = pageformat.KIND_INT64) -> bytes:
    return _sub(pageformat.encode_int_page(values, kind))


def _encode_node(arr: pa.Array, parts: list[bytes]) -> None:
    t = arr.type
    valid = (np.asarray(arr.is_valid()) if len(arr)
             else np.zeros(0, dtype=bool))
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        parts.append(bytes([_LIST if pa.types.is_list(t) else _LARGE_LIST]))
        parts.append(_enc_ints(valid.astype(np.int64), pageformat.KIND_INT32))
        offsets = np.asarray(arr.offsets, dtype=np.int64)
        lengths = np.diff(offsets)
        lengths[~valid] = 0  # canonical: null list == empty slice
        starts = offsets[:-1]
        pos = _gather_positions(starts, lengths)
        child = arr.values.take(pa.array(pos)) if len(pos) else arr.values.slice(0, 0)
        parts.append(_enc_ints(lengths))
        _encode_node(child, parts)
    elif pa.types.is_struct(t):
        parts.append(bytes([_STRUCT]))
        parts.append(_enc_ints(valid.astype(np.int64), pageformat.KIND_INT32))
        parts.append(bytes([t.num_fields]))
        for i in range(t.num_fields):
            name = t.field(i).name.encode("utf-8")
            parts.append(struct.pack("<H", len(name)))
            parts.append(name)
            _encode_node(arr.field(i), parts)
    elif pa.types.is_int64(t):
        parts.append(bytes([_LEAF]))
        parts.append(_enc_ints(valid.astype(np.int64), pageformat.KIND_INT32))
        vals = (np.asarray(arr.fill_null(0), dtype=np.int64) if len(arr)
                else np.zeros(0, np.int64))
        parts.append(_enc_ints(vals))
    elif (pa.types.is_string(t) or pa.types.is_large_string(t)
          or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
        kind = {pa.string(): _STR, pa.large_string(): _LARGE_STR,
                pa.binary(): _BIN, pa.large_binary(): _LARGE_BIN}[t]
        parts.append(bytes([kind]))
        parts.append(_enc_ints(valid.astype(np.int64), pageformat.KIND_INT32))
        if len(arr):
            fill = "" if kind in (_STR, _LARGE_STR) else b""
            off, data = pageformat._arrow_str_buffers(arr.fill_null(fill))
        else:
            off, data = np.zeros(1, np.int64), np.zeros(0, np.uint8)
        parts.append(_sub(pageformat.encode_string_page(off, data)))
    elif pa.types.is_boolean(t):
        parts.append(bytes([_BOOL]))
        parts.append(_enc_ints(valid.astype(np.int64), pageformat.KIND_INT32))
        vals = (np.asarray(arr.fill_null(False)) if len(arr)
                else np.zeros(0, bool))
        parts.append(_enc_ints(vals.astype(np.int64), pageformat.KIND_INT32))
    elif pa.types.is_float32(t) or pa.types.is_float64(t):
        # embedding leaves (list<float> columns): bit-exact float pages
        # with ALP/byte-shuffle auto-selection (pageformat)
        kind = _F32 if pa.types.is_float32(t) else _F64
        npdt = _FLOAT_KIND[kind][1]
        parts.append(bytes([kind]))
        parts.append(_enc_ints(valid.astype(np.int64), pageformat.KIND_INT32))
        vals = (np.asarray(arr.fill_null(0.0), dtype=npdt) if len(arr)
                else np.zeros(0, npdt))
        parts.append(_sub(pageformat.encode_float_page(vals)))
    else:
        raise ValueError(f"unsupported nested leaf/inner type: {t}")


def encode_nested_page(arr: pa.Array) -> bytes:
    """Encode a (possibly chunked) nested array, nulls anywhere."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    parts: list[bytes] = []
    _encode_node(arr, parts)
    payload = b"".join(parts)
    page = pageformat._wrap(NESTED_CODEC, pageformat.KIND_INT64, 0, len(arr),
                            0, 0, payload)
    # one DEFLATE pass over the whole tree (round 5): the sub-pages
    # already model per-node structure, but cross-node redundancy
    # (repeated validity shapes, shared string content across struct
    # fields) is only visible to an envelope-level entropy coder —
    # and a single pass beats deflating each sub-page separately
    return pageformat.maybe_deflate(page)


def _validity_buffer(valid: np.ndarray) -> pa.Buffer | None:
    if valid.all():
        return None
    return pa.py_buffer(np.packbits(valid.astype(np.uint8), bitorder="little"))


def _decode_node(mv: memoryview, p: int) -> tuple[pa.Array, int]:
    def take(pos: int) -> tuple[np.ndarray, int]:
        (ln,) = struct.unpack_from("<I", mv, pos)
        out = pageformat.decode_int_page(mv[pos + 4:pos + 4 + ln])
        return np.asarray(out, dtype=np.int64), pos + 4 + ln

    kind = mv[p]
    p += 1
    valid, p = take(p)
    valid = valid.astype(bool)
    if kind in (_LIST, _LARGE_LIST):
        lengths, p = take(p)
        child, p = _decode_node(mv, p)
        if kind == _LARGE_LIST:
            offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
            np.cumsum(lengths, out=offsets[1:])
            typ = pa.large_list(child.type)
        else:
            offsets = np.zeros(len(lengths) + 1, dtype=np.int32)
            np.cumsum(lengths, out=offsets[1:])
            typ = pa.list_(child.type)
        arr = pa.Array.from_buffers(
            typ, len(lengths),
            [_validity_buffer(valid), pa.py_buffer(offsets)],
            children=[child])
        return arr, p
    if kind == _STRUCT:
        n_children = mv[p]
        p += 1
        fields, children = [], []
        for _ in range(n_children):
            (nlen,) = struct.unpack_from("<H", mv, p)
            name = bytes(mv[p + 2:p + 2 + nlen]).decode("utf-8")
            p += 2 + nlen
            child, p = _decode_node(mv, p)
            fields.append(pa.field(name, child.type))
            children.append(child)
        arr = pa.Array.from_buffers(
            pa.struct(fields), len(valid),
            [_validity_buffer(valid)], children=children)
        return arr, p
    if kind == _LEAF:
        vals, p = take(p)
        arr = pa.Array.from_buffers(
            pa.int64(), len(vals),
            [_validity_buffer(valid), pa.py_buffer(vals)])
        return arr, p
    if kind in _BYTES_KIND:
        (ln,) = struct.unpack_from("<I", mv, p)
        off, data = pageformat.decode_string_page(mv[p + 4:p + 4 + ln])
        p += 4 + ln
        typ = _BYTES_KIND[kind]
        large = kind in (_LARGE_STR, _LARGE_BIN)
        off_buf = pa.py_buffer(off if large else off.astype(np.int32))
        arr = pa.Array.from_buffers(
            typ, len(off) - 1,
            [_validity_buffer(valid), off_buf, pa.py_buffer(data)])
        return arr, p
    if kind == _BOOL:
        vals, p = take(p)
        bits = np.packbits(vals.astype(np.uint8), bitorder="little")
        arr = pa.Array.from_buffers(
            pa.bool_(), len(vals),
            [_validity_buffer(valid), pa.py_buffer(bits)])
        return arr, p
    if kind in _FLOAT_KIND:
        (ln,) = struct.unpack_from("<I", mv, p)
        vals = pageformat.decode_float_page(mv[p + 4:p + 4 + ln])
        p += 4 + ln
        arr = pa.Array.from_buffers(
            _FLOAT_KIND[kind][0], len(vals),
            [_validity_buffer(valid), pa.py_buffer(vals)])
        return arr, p
    raise ValueError(f"unknown nested node kind {kind}")


def decode_nested_page(buf: bytes | memoryview) -> pa.Array:
    import zlib

    h = pageformat.read_header(buf)
    if h["codec"] == codecs.DEFLATED:
        return decode_nested_page(pageformat._inflate(buf, True))
    if h["codec"] != NESTED_CODEC:
        raise ValueError("not a nested page")
    mv = memoryview(buf)[pageformat.HEADER_SIZE:pageformat.HEADER_SIZE + h["payload_len"]]
    # the inner sub-pages carry their own CRCs, but the tree-structure
    # bytes between them (kind tags, lengths, struct field names) are
    # protected only by this envelope CRC — skipping it would let a bit
    # flip decode silently to a wrong schema or type
    if zlib.crc32(mv) != h["crc"]:
        raise ValueError("page crc mismatch")
    arr, _ = _decode_node(mv, 0)
    return arr
