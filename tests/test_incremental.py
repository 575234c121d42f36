"""Incremental changes read (Iceberg's incremental append scan):
decode_changes returns exactly the rows committed after a snapshot,
skips compaction rewrites (layout-only), and refuses when the since
snapshot fell off the retained chain."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tokencodec.spark import decode_job, encode_job, maintenance, streaming, synth
from tokencodec.spark.table import SnapshotTable


def test_changes_since_snapshot_exact_rows(spark, tmp_path):
    root = str(tmp_path / "t")
    a = synth.token_table(spark, 120, seed=11)
    b = synth.token_table(spark, 200, seed=11).filter(
        "doc_id > 'doc-000000000119'")  # disjoint second drop
    src = str(tmp_path / "src")
    a.write.mode("append").parquet(src)
    streaming.encode_stream(spark, src, root)
    sid0 = SnapshotTable(root).current_snapshot()["snapshot_id"]
    b.write.mode("append").parquet(src)
    streaming.encode_stream(spark, src, root)

    # changes since the first commit == exactly the second drop
    ch = decode_job.decode_changes(spark, root, sid0)
    assert decode_job.audit(b, ch, strict=True)["ok"]
    # changes since current == empty
    cur = SnapshotTable(root).current_snapshot()["snapshot_id"]
    assert decode_job.decode_changes(spark, root, cur).count() == 0
    # full decode still everything
    both = a.unionByName(b)
    assert decode_job.audit(both, decode_job.decode(spark, root))["ok"]
    # projection works on the incremental scan too
    ids = {r.doc_id for r in decode_job.decode_changes(
        spark, root, sid0, columns=["doc_id"]).collect()}
    assert ids == {r.doc_id for r in b.select("doc_id").collect()}


def test_changes_skip_compaction_rewrites(spark, tmp_path):
    """A compaction commit adds no logical rows: changes since the
    pre-compact snapshot must be empty, and changes since an earlier
    append must still decode from the ORIGINAL files (kept until
    expiry)."""
    root = str(tmp_path / "t")
    df = synth.token_table(spark, 150, seed=13)
    encode_job.encode(spark, df, root, commit_groups=2,
                      max_chunk_tokens=2000, direct_write=True)
    tbl = SnapshotTable(root)
    sid_mid = tbl.chain()[0]["snapshot_id"]  # after first commit group
    pre_compact = tbl.current_snapshot()["snapshot_id"]
    snap = maintenance.compact(spark, root, max_chunk_tokens=1 << 21)
    assert snap["snapshot_id"] == pre_compact + 1

    assert decode_job.decode_changes(spark, root, pre_compact).count() == 0
    # changes since the FIRST commit = the second commit group's rows
    ch = decode_job.decode_changes(spark, root, sid_mid)
    full = decode_job.decode(spark, root)
    n_first = decode_job.decode(
        spark, root, snapshot_id=sid_mid).count()
    assert ch.count() == full.count() - n_first


def test_changes_since_expired_snapshot_refuses(spark, tmp_path):
    root = str(tmp_path / "t")
    df = synth.token_table(spark, 80, seed=14)
    encode_job.encode(spark, df, root, commit_groups=2, direct_write=True)
    first = SnapshotTable(root).chain()[0]["snapshot_id"]
    maintenance.expire_snapshots(root, keep_last=1)
    with pytest.raises(ValueError, match="retained chain"):
        decode_job.decode_changes(spark, root, first)
    with pytest.raises(ValueError, match="retained chain"):
        decode_job.decode_changes(spark, root, 999)
