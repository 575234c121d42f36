"""Deterministic, partition-independent synthetic token table.

Schema = BASELINE.json input_hint:
  (doc_id string, tokens array<int32> non-null elements, n_tok int32,
   source string)

Every value is a pure function of (seed, row_id) via a stateless
splitmix64 hash — the table is bit-identical regardless of parallelism,
batching or partition count (required for N-vs-4N scaling runs and
resume audits, SURVEY.md §7.4). Generation itself is distributed:
spark.range -> mapInArrow with vectorized numpy kernels.

Profiles per FIXTURES.md §F1a — each one is engineered to make a
different codec win (uniform->bitpack, lowcard->dict, runs->RLE,
narrow->FOR, constant->RLE-degenerate, sorted->delta).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

VOCAB = 50257  # GPT-2-sized (FIXTURES.md F1a)
SOURCES = np.array(["web", "code", "books", "wiki", "chat"])
# zipfian-ish weights over 64 slots
_SOURCE_SLOTS = np.repeat(np.arange(5), [32, 16, 8, 5, 3])

SCHEMA_DDL = "doc_id string, tokens array<int>, n_tok int, source string"

PROFILES = ["uniform", "lowcard", "runs", "narrow", "constant", "sorted"]

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain algorithm)."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z ^= z >> np.uint64(30)
    z *= _M1
    z ^= z >> np.uint64(27)
    z *= _M2
    z ^= z >> np.uint64(31)
    return z


def _h(seed: int, ids: np.ndarray, stream: int) -> np.ndarray:
    k = (seed * 0x9E3779B97F4A7C15 + stream * 0xC2B2AE3D27D4EB4F) & 0xFFFFFFFFFFFFFFFF
    return _splitmix64(ids.astype(np.uint64) ^ np.uint64(k))


def _row_lengths(seed: int, ids: np.ndarray) -> np.ndarray:
    """Log-normal, median ~700, heavy tail: top ~0.1% ~100x median."""
    u1 = (_h(seed, ids, 1) >> np.uint64(11)).astype(np.float64) / (1 << 53)
    u2 = (_h(seed, ids, 2) >> np.uint64(11)).astype(np.float64) / (1 << 53)
    z = np.sqrt(-2 * np.log(u1 + 1e-18)) * np.cos(2 * np.pi * u2)
    n = np.exp(np.log(700.0) + 0.6 * z)
    heavy = (_h(seed, ids, 3) % np.uint64(1000)) == 0
    n = np.where(heavy, n * 100, n)
    return np.clip(n, 8, 200_000).astype(np.int64)


def _row_profile(seed: int, ids: np.ndarray) -> np.ndarray:
    return (_h(seed, ids, 4) % np.uint64(len(PROFILES))).astype(np.int64)


def _gen_tokens(seed: int, ids: np.ndarray, lengths: np.ndarray,
                profiles: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """-> (flat int32 token values, int64 offsets[len(ids)+1]).

    Stateless per (row, position): vectorized over the whole batch.
    """
    total = int(lengths.sum())
    offsets = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    out = np.empty(total, dtype=np.int64)

    flat_ids = np.repeat(ids.astype(np.uint64), lengths)
    pos = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lengths)
    flat_prof = np.repeat(profiles, lengths)
    base_h = _h(seed, flat_ids * np.uint64(0x100000001) + pos.astype(np.uint64), 5)

    for p, name in enumerate(PROFILES):
        m = flat_prof == p
        if not m.any():
            continue
        if name == "uniform":
            out[m] = (base_h[m] % np.uint64(VOCAB)).astype(np.int64)
        elif name == "lowcard":
            out[m] = ((base_h[m] % np.uint64(200)) * np.uint64(251) % np.uint64(50021)).astype(np.int64)
        elif name == "runs":
            # constant-ish runs: value changes every L positions, L per row
            L = 4 + (_h(seed, flat_ids[m], 6) % np.uint64(17)).astype(np.int64)
            run_idx = (pos[m] // L).astype(np.uint64)
            hv = _h(seed, flat_ids[m] * np.uint64(0x10001) + run_idx, 7)
            out[m] = (hv % np.uint64(1000)).astype(np.int64)
        elif name == "narrow":
            out[m] = 10_000 + (base_h[m] % np.uint64(128)).astype(np.int64)
        elif name == "constant":
            out[m] = (_h(seed, flat_ids[m], 8) % np.uint64(VOCAB)).astype(np.int64)
        elif name == "sorted":
            # ascending: base + position * step(row) + jitter, clipped to vocab*8
            step = 1 + (_h(seed, flat_ids[m], 9) % np.uint64(5)).astype(np.int64)
            out[m] = pos[m] * step + (base_h[m] % np.uint64(3)).astype(np.int64)
    return out.astype(np.int32), offsets


def generate_batch(seed: int, ids: np.ndarray) -> pa.RecordBatch:
    lengths = _row_lengths(seed, ids)
    profiles = _row_profile(seed, ids)
    values, offsets = _gen_tokens(seed, ids, lengths, profiles)
    src_idx = _SOURCE_SLOTS[(_h(seed, ids, 10) % np.uint64(64)).astype(np.int64)]
    # vectorized doc-id strings (no per-row Python)
    doc_id = pa.array(np.char.add("doc-", np.char.zfill(ids.astype("U12"), 12)),
                      type=pa.string())
    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                      pa.array(values, type=pa.int32()))
    return pa.RecordBatch.from_arrays(
        [doc_id, tokens,
         pa.array(lengths.astype(np.int32), type=pa.int32()),
         pa.array(SOURCES[src_idx], type=pa.string())],
        names=["doc_id", "tokens", "n_tok", "source"])


def token_table(spark: SparkSession, n_rows: int, seed: int = 42,
                partitions: int | None = None) -> DataFrame:
    """Distributed deterministic token table of ``n_rows`` sequences."""
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = spark.range(0, n_rows, 1, partitions)

    def gen(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            yield generate_batch(seed, ids)

    return base.mapInArrow(gen, SCHEMA_DDL)
