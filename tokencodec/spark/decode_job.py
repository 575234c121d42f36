"""Decode job: encoded pages table -> original token table, exact inverse.

Mirrors the reference's record reassembly but columnar: where
parquet-hs zips per-column value streams and folds Dremel instructions
into row objects (/root/reference/src/Parquet/Reader.hs:563-606), we
decode each column page vectorized and rebuild the `tokens` list column
directly from the n_tok prefix sums via
`pa.ListArray.from_arrays(offsets, values)` — no rep/def levels needed
for the flat+array schema (SURVEY.md §2a op #17-19).

``packed=True`` returns tokens as little-endian int32 BINARY blobs
instead of array<int32>: binary columns cross the Python->JVM Arrow
boundary as bulk buffer copies, while array<int32> goes through Spark's
per-element ArrowWriter — the same asymmetry that motivates the encode
fast source. `audit` consumes either representation.

`audit` is the engine's analog of the golden round-trip assert
(/root/reference/tests/integration/Spec.hs:96-98): per-row token-array
equality. Fast path: ONE aggregate per side over per-row xxhash64
(count + hash sum + hash xor), no shuffle of row data at all; the
double-exceptAll diff runs only when the signatures disagree.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

from tokencodec import pageformat
from tokencodec.spark.encode_job import read_pages
from tokencodec.spark.synth import SCHEMA_DDL

_PAGE_COLS = ["page_tokens", "page_doc_id", "page_n_tok", "page_source"]
_PART_COLS = _PAGE_COLS + ["doc_part", "doc_parts", "split_uid"]
_PART_DDL = SCHEMA_DDL + ", doc_part int, doc_parts int, split_uid string"
PACKED_SCHEMA_DDL = "doc_id string, tokens binary, n_tok int, source string"
_PACKED_PART_DDL = PACKED_SCHEMA_DDL + ", doc_part int, doc_parts int, split_uid string"


def _binary_views(col: pa.Array) -> tuple[np.ndarray, memoryview]:
    """Zero-copy row access into a binary column: (offsets, data view)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    odt = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    bufs = col.buffers()
    off = np.frombuffer(bufs[1], dtype=odt, count=len(col) + 1 + col.offset)
    off = off[col.offset:col.offset + len(col) + 1]
    # cast('B'): an arrow Buffer's memoryview is signed ('b'), and the
    # page parsers index bytes expecting unsigned semantics
    data = (memoryview(bufs[2]).cast("B") if bufs[2] is not None
            else memoryview(b""))
    return off, data


def _decode_chunk(p_tokens, p_doc, p_ntok, p_src, packed: bool) -> pa.RecordBatch:
    ntok = pageformat.decode_int_page(p_ntok)
    values = pageformat.decode_int_page(p_tokens)
    n = len(ntok)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(ntok, out=offsets[1:])
    if packed:
        blob = np.ascontiguousarray(values.astype(np.int32, copy=False)).view(np.uint8)
        tokens = pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer((offsets * 4).astype(np.int32)), pa.py_buffer(blob)])
    else:
        tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                          pa.array(values, type=pa.int32()))
    do, dd = pageformat.decode_string_page(p_doc)
    so, sd = pageformat.decode_string_page(p_src)
    doc_id = pa.Array.from_buffers(pa.large_string(), n,
                                   [None, pa.py_buffer(do), pa.py_buffer(dd)]).cast(pa.string())
    source = pa.Array.from_buffers(pa.large_string(), n,
                                   [None, pa.py_buffer(so), pa.py_buffer(sd)]).cast(pa.string())
    return pa.RecordBatch.from_arrays(
        [doc_id, tokens, pa.array(ntok.astype(np.int32), type=pa.int32()), source],
        names=["doc_id", "tokens", "n_tok", "source"])


def make_decode_batches(packed: bool = False):
    def decode_batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            idx = {n: i for i, n in enumerate(batch.schema.names)}
            # zero-copy page access: slice memoryviews out of the binary
            # columns instead of .as_py() copies
            views = [_binary_views(batch.column(idx[c])) for c in _PAGE_COLS]
            parts = [batch.column(idx[c]) for c in ("doc_part", "doc_parts")]
            uids = batch.column(idx["split_uid"])
            for r in range(batch.num_rows):
                chunk = _decode_chunk(
                    *(data[off[r]:off[r + 1]] for off, data in views), packed)
                n = chunk.num_rows
                yield pa.RecordBatch.from_arrays(
                    list(chunk.columns)
                    + [pa.array([parts[0][r].as_py()] * n, pa.int32()),
                       pa.array([parts[1][r].as_py()] * n, pa.int32()),
                       pa.array([uids[r].as_py()] * n, pa.string())],
                    names=list(chunk.schema.names) + ["doc_part", "doc_parts", "split_uid"])

    return decode_batches


decode_batches = make_decode_batches(False)


def decode(spark: SparkSession, root: str,
           doc_id_min: str | None = None, doc_id_max: str | None = None,
           buckets: list[int] | None = None, packed: bool = False) -> DataFrame:
    """Decode committed pages; optional chunk pruning on lineage.

    Data skipping the reference lacks entirely (it always decodes every
    column chunk of every row group, /root/reference/src/Parquet/Reader.hs:577-585):
    the per-chunk doc-id range and length bucket recorded at encode time
    prune whole chunks BEFORE any page crosses the Arrow boundary —
    min/max skipping exactly like Iceberg/parquet row-group stats.
    A doc-id range filter is re-applied row-level after decode (chunk
    ranges overlap the predicate, rows must match it exactly).
    """
    from pyspark.sql import functions as F

    pages = read_pages(spark, root)
    if doc_id_min is not None:
        pages = pages.filter(F.col("doc_id_max") >= doc_id_min)
    if doc_id_max is not None:
        pages = pages.filter(F.col("doc_id_min") <= doc_id_max)
    if buckets is not None:
        pages = pages.filter(F.col("bucket").isin(buckets))
    has_parts = "doc_part" in pages.columns
    if not has_parts:
        # tables written before doc splitting existed: every chunk whole
        pages = (pages.withColumn("doc_part", F.lit(0))
                 .withColumn("doc_parts", F.lit(1)))
    else:
        # mixed-version tables: rows from files predating these columns
        # surface as NULL under mergeSchema — NULL doc_parts would fail
        # BOTH split-branch filters and silently drop the rows
        pages = pages.na.fill({"doc_part": 0, "doc_parts": 1})
    if "split_uid" not in pages.columns:
        # pre-split_uid tables: decode-side coalesce with doc_id (below)
        # reproduces the legacy grouping
        pages = pages.withColumn("split_uid", F.lit(None).cast("string"))
    # cheap metadata probe (columnar scan of one small column): skip the
    # reassembly aggregate entirely when no document was split
    max_parts = (pages.agg(F.max("doc_parts")).collect()[0][0]
                 if has_parts else 1)
    any_split = bool(max_parts and max_parts > 1)
    # column pruning: only the binary pages (+ part markers) cross the
    # Arrow boundary
    ddl = _PACKED_PART_DDL if packed else _PART_DDL
    raw = pages.select(_PART_COLS).mapInArrow(make_decode_batches(packed), ddl)
    if not any_split:
        out = raw.drop("doc_part", "doc_parts", "split_uid")
    else:
        whole = raw.filter(F.col("doc_parts") == 1).drop(
            "doc_part", "doc_parts", "split_uid")
        split = raw.filter(F.col("doc_parts") > 1)
        # oversized documents were split across chunks at encode time
        # (skew handling); reassemble token parts in doc_part order,
        # grouped on the encode-time split uid (NOT doc_id: a duplicate
        # doc_id encoded twice must yield two rows, never one merged
        # corruption) — the struct sort + flatten/concat is all JVM-side
        parts_sorted = F.array_sort(F.collect_list(F.struct("doc_part", "tokens")))
        tok_parts = F.transform(parts_sorted, lambda s: s["tokens"])
        tok = (F.aggregate(tok_parts, F.lit(b""), lambda acc, x: F.concat(acc, x))
               if packed else F.flatten(tok_parts))
        # legacy rows (pre-split_uid files, incl. inside mixed-version
        # tables) carry NULL split_uid; their chunks hold exactly one
        # doc, so doc_id is the historical group key — the coalesce
        # keeps them correct without merging across documents
        split = split.withColumn(
            "split_uid", F.coalesce(F.col("split_uid"), F.col("doc_id")))
        reassembled = (split.groupBy("split_uid")
                       .agg(F.first("doc_id").alias("doc_id"),
                            tok.alias("tokens"),
                            F.sum("n_tok").cast("int").alias("n_tok"),
                            F.first("source").alias("source"))
                       .select("doc_id", "tokens", "n_tok", "source"))
        out = whole.unionByName(reassembled)
    if doc_id_min is not None:
        out = out.filter(F.col("doc_id") >= doc_id_min)
    if doc_id_max is not None:
        out = out.filter(F.col("doc_id") <= doc_id_max)
    return out


def _signature(df: DataFrame):
    """One-pass order-insensitive multiset signature: (count, sum of
    per-row xxhash64 in decimal space — no overflow — and xor)."""
    from pyspark.sql import functions as F

    h = F.xxhash64("doc_id", "tokens", "n_tok", "source")
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(h.cast("decimal(38,0)")).alias("hsum"),
        F.bit_xor(h).alias("hxor")).collect()[0]


def audit(original: DataFrame, decoded: DataFrame, strict: bool = False) -> dict:
    """Distributed per-row equality (token-array equality invariant).

    Fast path (default): compare per-side aggregate signatures — each
    side is scanned ONCE with a partial-aggregate plan (no shuffle of
    row data, only one tiny merge exchange), versus exceptAll's two full
    shuffles of both tables. On signature mismatch (or strict=True) the
    exact exceptAll diff runs to report row counts.
    """
    if not strict:
        a = _signature(original.select("doc_id", "tokens", "n_tok", "source"))
        b = _signature(decoded.select("doc_id", "tokens", "n_tok", "source"))
        if tuple(a) == tuple(b):
            return {"missing": 0, "extra": 0, "ok": True}
    missing = original.exceptAll(decoded).count()
    extra = decoded.exceptAll(original).count()
    return {"missing": missing, "extra": extra,
            "ok": missing == 0 and extra == 0}
