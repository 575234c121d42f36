"""Per-chunk doc-id Bloom filters: point-lookup pruning metadata.

Parquet (ColumnMetaData.bloom_filter_offset) and Iceberg v2 attach
Bloom filters to column chunks so an exact-match predicate can skip
chunks whose min/max range matches but which cannot contain the value.
The reference parses chunk Statistics but has no Bloom surface
(/root/reference/src/Parquet/Types/ColumnChunk.hs:19-30); this engine
adds it for the lookup a 100-TB training table actually serves:
"fetch / verify-takedown of ONE doc_id". Salt pruning (decode_job)
narrows such a lookup to 1/n_salts of chunks; the Bloom filter then
skips all but ~1 chunk of that salt — without it every chunk of the
salt is parsed, because hash-spread doc_id ranges carry no order.

Layout (little-endian, stored in the pages table's `doc_bloom` binary
column, NULL = unknown = never prune):
    u32 m_bits (power of two) | u8 k | bitmap (m_bits/8 bytes)

Hashing: pandas' vectorized SipHash-1-3 (`pd.util.hash_array`, fixed
default key) -> double hashing h1 + i*h2 (Kirsch-Mitzenmacher) for k
probe positions. Deterministic within an environment — the same
standard as the zlib wrap bytes; decode correctness never depends on
it (a changed hash can only cost pruning power on old tables, and only
if build and probe disagree, which cannot happen inside one process).
Sizing: m = next power of two >= 10 bits/doc (~1% FPR at k=7),
clamped to [64 bits, 2^19 bits] so a degenerate 1-token-per-doc chunk
caps its filter at 64 KiB (FPR degrades gracefully past the cap).
"""

from __future__ import annotations

import struct

import numpy as np

_HEADER = struct.Struct("<IB")
_K = 7
_BITS_PER_DOC = 10
_MIN_M = 1 << 6
_MAX_M = 1 << 19


def _hashes(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """-> (h1, h2) uint64 arrays; h2 forced odd so probe strides cycle."""
    import pandas as pd
    h = pd.util.hash_array(np.asarray(ids, dtype=object))
    h1 = h
    h2 = (h >> np.uint64(33)) | np.uint64(1)
    return h1, h2


def _m_bits(n_docs: int) -> int:
    target = max(int(n_docs) * _BITS_PER_DOC, 1)
    m = 1 << (target - 1).bit_length()
    return min(max(m, _MIN_M), _MAX_M)


def build(doc_ids) -> bytes:
    """Bloom blob over a chunk's doc ids (duplicates are free)."""
    ids = np.asarray(doc_ids, dtype=object)
    m = _m_bits(len(ids))
    bitmap = np.zeros(m >> 3, dtype=np.uint8)
    if len(ids):
        h1, h2 = _hashes(ids)
        probes = np.arange(_K, dtype=np.uint64)
        pos = (h1[:, None] + probes * h2[:, None]) & np.uint64(m - 1)
        pos = np.unique(pos.ravel())
        np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return _HEADER.pack(m, _K) + bitmap.tobytes()


def might_contain(blob: bytes | memoryview | None, doc_id: str) -> bool:
    """False ONLY when the chunk provably lacks doc_id; NULL blob or a
    malformed blob (forward-compat: a future layout) -> True (keep)."""
    if blob is None:
        return True
    mv = memoryview(blob)
    if len(mv) < _HEADER.size:
        return True
    m, k = _HEADER.unpack_from(mv, 0)
    if m & (m - 1) or len(mv) != _HEADER.size + (m >> 3) or not (1 <= k <= 32):
        return True
    bitmap = np.frombuffer(mv, dtype=np.uint8, offset=_HEADER.size)
    h1, h2 = _hashes(np.array([doc_id], dtype=object))
    pos = (h1[0] + np.arange(k, dtype=np.uint64) * h2[0]) & np.uint64(m - 1)
    return bool((bitmap[pos >> np.uint64(3)]
                 >> (pos & np.uint64(7)).astype(np.uint8) & 1).all())


def series_might_contain_any(blobs, doc_ids) -> np.ndarray:
    """Batch-lookup variant: keep a chunk when ANY of the target ids
    might be present. Targets are hashed once; per chunk the test is
    len(doc_ids) x k vectorized bit probes. NULL/malformed blob ->
    keep. Takedown-sized target lists by contract (the same bound as
    decode's broadcast delete sets)."""
    h1, h2 = _hashes(np.asarray(doc_ids, dtype=object))
    probes = np.arange(_K, dtype=np.uint64)
    out = np.ones(len(blobs), dtype=bool)
    for i, blob in enumerate(blobs):
        if blob is None:
            continue
        mv = memoryview(blob)
        if len(mv) < _HEADER.size:
            continue
        m, k = _HEADER.unpack_from(mv, 0)
        if m & (m - 1) or len(mv) != _HEADER.size + (m >> 3) or not (1 <= k <= 32):
            continue
        p = probes[:k] if k <= _K else np.arange(k, dtype=np.uint64)
        pos = (h1[:, None] + p * h2[:, None]) & np.uint64(m - 1)
        bitmap = np.frombuffer(mv, dtype=np.uint8, offset=_HEADER.size)
        hits = ((bitmap[pos >> np.uint64(3)]
                 >> (pos & np.uint64(7)).astype(np.uint8)) & 1).all(axis=1)
        out[i] = bool(hits.any())
    return out


def contains_all(blob: bytes | memoryview, ids) -> bool:
    """True iff EVERY id tests positive — the integrity invariant fsck
    checks (a Bloom filter may false-positive but never false-negative
    on the ids it was built from). Fully vectorized."""
    mv = memoryview(blob)
    if len(mv) < _HEADER.size:
        return False
    m, k = _HEADER.unpack_from(mv, 0)
    if m & (m - 1) or len(mv) != _HEADER.size + (m >> 3) or not (1 <= k <= 32):
        return False
    bitmap = np.frombuffer(mv, dtype=np.uint8, offset=_HEADER.size)
    h1, h2 = _hashes(np.asarray(ids, dtype=object))
    pos = (h1[:, None] + np.arange(k, dtype=np.uint64) * h2[:, None]) \
        & np.uint64(m - 1)
    return bool(((bitmap[pos >> np.uint64(3)]
                  >> (pos & np.uint64(7)).astype(np.uint8)) & 1).all())


def series_might_contain(blobs, doc_id: str) -> np.ndarray:
    """Vectorized-over-chunks membership test for ONE doc_id: the
    target is hashed once; each chunk's (m, bitmap) is then a couple of
    array lookups. Chunk-granular loop (like fsck), never per-row."""
    h1, h2 = _hashes(np.array([doc_id], dtype=object))
    probes = np.arange(_K, dtype=np.uint64)
    out = np.ones(len(blobs), dtype=bool)
    for i, blob in enumerate(blobs):
        if blob is None:
            continue
        mv = memoryview(blob)
        if len(mv) < _HEADER.size:
            continue
        m, k = _HEADER.unpack_from(mv, 0)
        if m & (m - 1) or len(mv) != _HEADER.size + (m >> 3) or not (1 <= k <= 32):
            continue
        p = probes[:k] if k <= _K else np.arange(k, dtype=np.uint64)
        pos = (h1[0] + p * h2[0]) & np.uint64(m - 1)
        bitmap = np.frombuffer(mv, dtype=np.uint8, offset=_HEADER.size)
        out[i] = bool((bitmap[pos >> np.uint64(3)]
                       >> (pos & np.uint64(7)).astype(np.uint8) & 1).all())
    return out
