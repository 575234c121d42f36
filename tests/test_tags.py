"""Snapshot tags (named immutable refs, Iceberg-style): creation /
resolution semantics, time travel by name through decode, and the
retention hold — tagged snapshots and their data files must survive
expire_snapshots and remove_orphan_files even once they sit outside the
retained parent chain."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tokencodec.spark import decode_job, encode_job, maintenance, synth
from tokencodec.spark.table import SnapshotTable


def _two_commit_root(spark, tmp_path, n1=40, n2=40):
    """batch g commits rows [0, n1); batch h appends [n1, n1+n2)."""
    root = str(tmp_path / "t")
    full = synth.token_table(spark, n1 + n2, seed=7)
    d1 = full.limit(n1)
    d2 = full.subtract(d1)
    encode_job.encode(spark, d1, root, commit_groups=1, max_chunk_tokens=512)
    encode_job.encode(spark, d2, root, commit_groups=1, max_chunk_tokens=512,
                      group_prefix="h")
    return root, d1, full


def test_tag_create_resolve_list_drop(spark, tmp_path):
    root, _, _ = _two_commit_root(spark, tmp_path)
    tbl = SnapshotTable(root)
    sid0 = tbl.chain()[0]["snapshot_id"]
    ref = tbl.create_tag("v1", snapshot_id=sid0)
    assert ref["snapshot_id"] == sid0
    assert tbl.tag("v1")["snapshot_id"] == sid0
    # default pins the CURRENT snapshot
    tbl.create_tag("head")
    assert (tbl.tag("head")["snapshot_id"]
            == tbl.current_snapshot()["snapshot_id"])
    assert [r["name"] for r in tbl.tags()] == ["head", "v1"]
    tbl.drop_tag("head")
    assert [r["name"] for r in tbl.tags()] == ["v1"]
    with pytest.raises(FileNotFoundError):
        tbl.tag("head")
    with pytest.raises(FileNotFoundError):
        tbl.drop_tag("head")


def test_tag_immutability_and_validation(spark, tmp_path):
    root, _, _ = _two_commit_root(spark, tmp_path)
    tbl = SnapshotTable(root)
    tbl.create_tag("v1")
    with pytest.raises(ValueError, match="already exists"):
        tbl.create_tag("v1")
    for bad in ["", "a/b", "../up", ".hidden", "a b", "x" * 80]:
        with pytest.raises(ValueError, match="invalid tag name"):
            tbl.create_tag(bad)
    with pytest.raises(FileNotFoundError):
        tbl.create_tag("vx", snapshot_id=999)
    empty = SnapshotTable(str(tmp_path / "empty"))
    with pytest.raises(ValueError, match="empty table"):
        empty.create_tag("v1")


def test_decode_at_tag_matches_snapshot_id(spark, tmp_path):
    root, d1, _ = _two_commit_root(spark, tmp_path)
    tbl = SnapshotTable(root)
    sid0 = tbl.chain()[0]["snapshot_id"]
    tbl.create_tag("v1", snapshot_id=sid0)
    by_tag = decode_job.decode(spark, root, tag="v1")
    assert decode_job.audit(d1, by_tag)["ok"]
    by_id = decode_job.decode(spark, root, snapshot_id=sid0)
    assert by_tag.exceptAll(by_id).isEmpty()
    assert by_id.exceptAll(by_tag).isEmpty()
    with pytest.raises(ValueError, match="either tag or snapshot_id"):
        decode_job.decode(spark, root, tag="v1", snapshot_id=sid0)
    with pytest.raises(FileNotFoundError):
        decode_job.decode(spark, root, tag="nope")


def test_expire_keeps_tagged_snapshot_and_files(spark, tmp_path):
    root, d1, full = _two_commit_root(spark, tmp_path)
    tbl = SnapshotTable(root)
    sid0 = tbl.chain()[0]["snapshot_id"]
    tbl.create_tag("v1", snapshot_id=sid0)
    # a third commit so expiry has an untagged middle manifest to drop
    extra = synth.token_table(spark, 120, seed=8).limit(20).subtract(full)
    encode_job.encode(spark, extra, root, commit_groups=1,
                      max_chunk_tokens=512, group_prefix="i")
    res = maintenance.expire_snapshots(root, keep_last=1)
    assert res["expired_snapshots"] == 1  # the untagged middle one
    # tagged snapshot still resolvable + bit-identical
    assert decode_job.audit(
        d1, decode_job.decode(spark, root, tag="v1"), strict=True)["ok"]
    # current table untouched
    assert decode_job.audit(
        full.unionByName(extra), decode_job.decode(spark, root))["ok"]
    # drop the hold: the snapshot is now OFF-CHAIN debris (expire is
    # chain-only by design), so reclamation goes through the
    # age-guarded orphan GC — which deletes the manifest but not the
    # data files the current snapshot still shares
    tbl.drop_tag("v1")
    res2 = maintenance.remove_orphan_files(root, older_than_hours=0.0)
    assert res2["deleted_claim_manifests"] == 1
    with pytest.raises(FileNotFoundError):
        decode_job.decode(spark, root, snapshot_id=sid0)
    assert decode_job.audit(
        full.unionByName(extra), decode_job.decode(spark, root))["ok"]


def test_expire_age_policy_keeps_young_history(spark, tmp_path):
    """Time-based retention on top of the count: snapshots younger than
    the cutoff survive (manifest + files + time travel), and a cutoff
    of zero restores pure count-based behavior."""
    root, d1, full = _two_commit_root(spark, tmp_path)
    sid0 = SnapshotTable(root).chain()[0]["snapshot_id"]
    res = maintenance.expire_snapshots(root, keep_last=1,
                                       older_than_hours=9999.0)
    assert res["expired_snapshots"] == 0
    assert decode_job.audit(
        d1, decode_job.decode(spark, root, snapshot_id=sid0))["ok"]
    res2 = maintenance.expire_snapshots(root, keep_last=1,
                                        older_than_hours=0.0)
    assert res2["expired_snapshots"] == 1
    with pytest.raises(FileNotFoundError):
        decode_job.decode(spark, root, snapshot_id=sid0)
    assert decode_job.audit(full, decode_job.decode(spark, root))["ok"]


def test_vector_table_decode_at_tag(spark, tmp_path):
    """Tags are a table-layer feature: the vector table gets the same
    time-travel-by-name read, including after an append."""
    from pyspark.sql import functions as F
    from tokencodec.spark import vectors

    src = spark.range(64).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(1), F.lit(8)),
                    lambda i: (F.col("id") + i).cast("float") / 7.0)
        .alias("embedding"),
        (F.col("id") % 3).cast("int").alias("label"))
    root = str(tmp_path / "v")
    vectors.encode_vectors(spark, src.filter("vec_id < 32"), root,
                           chunk_rows=16)
    tbl = SnapshotTable(root)
    tbl.create_tag("v1")
    vectors.encode_vectors(spark, src.filter("vec_id >= 32"), root,
                           chunk_rows=16, group="batch2")
    at_tag = vectors.decode_vectors(spark, root, tag="v1")
    assert at_tag.count() == 32
    assert at_tag.agg(F.max("vec_id")).first()[0] == 31
    assert vectors.decode_vectors(spark, root).count() == 64


def test_orphan_gc_spares_offchain_tagged_manifest(spark, tmp_path):
    root, d1, full = _two_commit_root(spark, tmp_path)
    tbl = SnapshotTable(root)
    sid0 = tbl.chain()[0]["snapshot_id"]
    tbl.create_tag("v1", snapshot_id=sid0)
    extra = synth.token_table(spark, 120, seed=8).limit(20).subtract(full)
    encode_job.encode(spark, extra, root, commit_groups=1,
                      max_chunk_tokens=512, group_prefix="i")
    maintenance.expire_snapshots(root, keep_last=1)
    # the tagged snapshot now sits OFF the chain (its successor manifest
    # was expired); an aggressive orphan GC must not treat it as a
    # legacy claim nor sweep its run dirs
    res = maintenance.remove_orphan_files(root, older_than_hours=0.0)
    assert res["deleted_claim_manifests"] == 0
    assert res["deleted_orphan_dirs"] == 0
    assert decode_job.audit(
        d1, decode_job.decode(spark, root, tag="v1"), strict=True)["ok"]
