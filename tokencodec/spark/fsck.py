"""Integrity verification (fsck) for an encoded snapshot table.

Distributed analog of the reference's page-byte accounting and
validation discipline (`validate_consumed_page_bytes`
/root/reference/src/Parquet/Stream/Reader.hs:349-353, rep/def zip
checks :111-120): every committed chunk's four pages are parsed,
CRC-verified, and cross-checked — tokens page value count must equal
the n_tok page's sum, string pages must carry n_rows values, and the
recorded enc/raw byte metrics must match the page headers. Runs as one
mapInArrow pass; returns a per-chunk report DataFrame.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

from tokencodec import pageformat
from tokencodec.spark.decode_job import decode_extra_page
from tokencodec.spark.encode_job import read_pages

REPORT_DDL = ("chunk_uid string, ok boolean, error string, "
              "n_rows int, n_tokens bigint, crc_checked int")

_COLS = ["chunk_uid", "n_rows", "n_tokens", "raw_bytes", "enc_bytes",
         "page_tokens", "page_doc_id", "page_n_tok", "page_source",
         "extra_pages", "doc_bloom"]


def _check_chunk(row: dict) -> tuple[bool, str, int]:
    checked = 0
    try:
        ntok = pageformat.decode_int_page(row["page_n_tok"])
        checked += 1
        h_tok = pageformat.read_header(row["page_tokens"])
        tok = pageformat.decode_int_page(row["page_tokens"])  # CRC-verified
        checked += 1
        do, dd = pageformat.decode_string_page(row["page_doc_id"])
        checked += 1
        # Bloom integrity: every stored doc_id must test positive in the
        # chunk's filter (false positives are fine; a false negative
        # means decode's point-lookup pruning would DROP this chunk's
        # rows). NULL blob (pre-bloom files) is legitimate.
        if row.get("doc_bloom") is not None and len(do) - 1 == row["n_rows"]:
            from tokencodec import bloom
            ids = pa.Array.from_buffers(
                pa.large_utf8(), row["n_rows"],
                [None, pa.py_buffer(np.ascontiguousarray(do)),
                 pa.py_buffer(dd)]).to_numpy(zero_copy_only=False)
            if not bloom.contains_all(row["doc_bloom"], ids):
                return (False, "doc_bloom misses a stored doc_id "
                        "(point lookups would mis-prune)", checked)
            checked += 1
        so, _ = pageformat.decode_string_page(row["page_source"])
        checked += 1
        # schema-evolution extra pages: CRC + per-row count, and their
        # bytes participate in the enc/raw metric reconciliation
        extras = dict(row.get("extra_pages") or {})
        for name, page in extras.items():
            # full decode through every wrapper layer (DEFLATED /
            # NULLABLE / value codec) — CRCs verify at each layer; the
            # declared width is irrelevant to integrity, so decode at
            # the recorded kind
            n_vals = len(decode_extra_page(page))
            checked += 1
            if n_vals != row["n_rows"]:
                return (False, f"extra page '{name}' count {n_vals} != "
                        f"n_rows {row['n_rows']}", checked)
        if len(ntok) != row["n_rows"]:
            return False, f"n_tok count {len(ntok)} != n_rows {row['n_rows']}", checked
        if int(ntok.sum()) != row["n_tokens"] or len(tok) != row["n_tokens"]:
            return (False, f"token count mismatch: sum(n_tok)={int(ntok.sum())} "
                    f"decoded={len(tok)} recorded={row['n_tokens']}", checked)
        if len(do) - 1 != row["n_rows"] or len(so) - 1 != row["n_rows"]:
            return False, "string page row-count mismatch", checked
        enc = (sum(len(row[p]) for p in ("page_tokens", "page_doc_id",
                                         "page_n_tok", "page_source"))
               + sum(len(p) for p in extras.values()))
        if enc != row["enc_bytes"]:
            return False, f"enc_bytes metric {row['enc_bytes']} != pages {enc}", checked
        raw = (sum(pageformat.read_header(row[p])["raw_size"]
                   for p in ("page_tokens", "page_doc_id",
                             "page_n_tok", "page_source"))
               + sum(pageformat.read_header(p)["raw_size"]
                     for p in extras.values()))
        if raw != row["raw_bytes"]:
            return False, f"raw_bytes metric {row['raw_bytes']} != headers {raw}", checked
        if h_tok["n_values"] != row["n_tokens"]:
            return False, "tokens header n_values mismatch", checked
        return True, "", checked
    except Exception as e:  # corrupt page: CRC, truncation, bad magic
        return False, f"{type(e).__name__}: {e}", checked


_PAGE_COLS = ("page_tokens", "page_doc_id", "page_n_tok", "page_source")


def fsck_batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    from tokencodec.spark.decode_job import _binary_views, _map_binary_views
    for batch in it:
        if batch.num_rows == 0:
            continue
        idx = {n: i for i, n in enumerate(batch.schema.names)}
        cols = {n: batch.column(idx[n]) for n in _COLS}
        # zero-copy page access: memoryview slices into the binary
        # columns (incl. the extra_pages map values); .as_py() would
        # copy every page's bytes per row. Scalar metadata converts
        # once per batch, not per row.
        views = {n: _binary_views(cols[n]) for n in _PAGE_COLS}
        moff, mkeys, voff, vdata = _map_binary_views(cols["extra_pages"])
        scalars = {n: cols[n].to_pylist() for n in _COLS
                   if n not in _PAGE_COLS and n != "extra_pages"}
        rows_ok, errs, nrows, ntoks, uids, checked = [], [], [], [], [], []
        for r in range(batch.num_rows):
            row = {n: v[r] for n, v in scalars.items()}
            for n, (off, data) in views.items():
                row[n] = data[off[r]:off[r + 1]]
            row["extra_pages"] = {mkeys[j]: vdata[voff[j]:voff[j + 1]]
                                  for j in range(moff[r], moff[r + 1])}
            ok, err, chk = _check_chunk(row)
            uids.append(row["chunk_uid"])
            rows_ok.append(ok)
            errs.append(err)
            nrows.append(row["n_rows"])
            ntoks.append(row["n_tokens"])
            checked.append(chk)
        yield pa.RecordBatch.from_arrays(
            [pa.array(uids, pa.string()), pa.array(rows_ok, pa.bool_()),
             pa.array(errs, pa.string()), pa.array(nrows, pa.int32()),
             pa.array(ntoks, pa.int64()), pa.array(checked, pa.int32())],
            names=["chunk_uid", "ok", "error", "n_rows", "n_tokens", "crc_checked"])


def fsck(spark: SparkSession, root: str,
         branch: str | None = None) -> DataFrame:
    pages = read_pages(spark, root, branch=branch).select(_COLS)
    return pages.mapInArrow(fsck_batches, REPORT_DDL)


# ------------------------------------------------------------ vector tables

_VCOLS = ["chunk_uid", "n_rows", "dim", "vec_id_min", "vec_id_max",
          "raw_bytes", "enc_bytes", "page_vec_id", "page_emb", "page_label"]
_VPAGE_COLS = ("page_vec_id", "page_emb", "page_label")


def _check_vec_chunk(row: dict) -> tuple[bool, str, int]:
    checked = 0
    try:
        ids = pageformat.decode_int_page(row["page_vec_id"])
        checked += 1
        emb = pageformat.decode_float_page(row["page_emb"])
        checked += 1
        lab = pageformat.decode_int_page(row["page_label"])
        checked += 1
        n = row["n_rows"]
        if len(ids) != n or len(lab) != n:
            return False, f"id/label count != n_rows {n}", checked
        if len(emb) != n * row["dim"]:
            return (False, f"embedding values {len(emb)} != "
                    f"n_rows*dim {n * row['dim']}", checked)
        if n and (int(ids.min()) != row["vec_id_min"]
                  or int(ids.max()) != row["vec_id_max"]):
            return False, "vec_id stats do not match decoded ids", checked
        enc = sum(len(row[p]) for p in _VPAGE_COLS)
        if enc != row["enc_bytes"]:
            return False, f"enc_bytes metric {row['enc_bytes']} != pages {enc}", checked
        return True, "", checked
    except Exception as e:  # corrupt page: CRC, truncation, bad magic
        return False, f"{type(e).__name__}: {e}", checked


def fsck_vector_batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    from tokencodec.spark.decode_job import _binary_views
    for batch in it:
        if batch.num_rows == 0:
            continue
        idx = {n: i for i, n in enumerate(batch.schema.names)}
        cols = {n: batch.column(idx[n]) for n in _VCOLS}
        views = {n: _binary_views(cols[n]) for n in _VPAGE_COLS}
        scalars = {n: cols[n].to_pylist() for n in _VCOLS
                   if n not in _VPAGE_COLS}
        uids, rows_ok, errs, nrows, checked = [], [], [], [], []
        for r in range(batch.num_rows):
            row = {n: v[r] for n, v in scalars.items()}
            for n, (off, data) in views.items():
                row[n] = data[off[r]:off[r + 1]]
            ok, err, chk = _check_vec_chunk(row)
            uids.append(row["chunk_uid"])
            rows_ok.append(ok)
            errs.append(err)
            nrows.append(row["n_rows"])
            checked.append(chk)
        yield pa.RecordBatch.from_arrays(
            [pa.array(uids, pa.string()), pa.array(rows_ok, pa.bool_()),
             pa.array(errs, pa.string()), pa.array(nrows, pa.int32()),
             pa.array([0] * len(uids), pa.int64()),
             pa.array(checked, pa.int32())],
            names=["chunk_uid", "ok", "error", "n_rows", "n_tokens",
                   "crc_checked"])


def fsck_vectors(spark: SparkSession, root: str) -> DataFrame:
    """Same validation discipline over a vector table's three pages:
    CRCs, count/stat cross-checks, byte-metric reconciliation."""
    from tokencodec.spark.vectors import read_vector_pages
    pages = read_vector_pages(spark, root).select(_VCOLS)
    return pages.mapInArrow(fsck_vector_batches, REPORT_DDL)
