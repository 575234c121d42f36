"""Snapshot-chain integrity: crashed committers' claim files, snapshot
expiry, and split-document planning must compose safely (regression
tests for three reproduced bugs: expire trusting an unreachable claim
as the newest snapshot, commit wedging forever on a dead claim, and
decode underestimating max_doc_parts after expiry)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tokencodec.spark import decode_job, encode_job, maintenance, synth
from tokencodec.spark.table import SnapshotTable


def _plant_dead_claim(root):
    """Simulate a committer that crashed after create_excl but before
    the CURRENT swap: a well-formed manifest the pointer never names."""
    tbl = SnapshotTable(root)
    cur = tbl.current_snapshot()
    sid = cur["snapshot_id"] + 1
    claim = {"snapshot_id": sid, "parent_id": cur["snapshot_id"],
             "timestamp_ms": 0, "groups": {"gdead": ["/nonexistent/path"]},
             "new_groups": ["gdead"], "metrics": {}}
    path = os.path.join(root, "_manifest", f"snapshot-{sid:06d}.json")
    with open(path, "w") as f:
        json.dump(claim, f)
    return sid, path


def test_expire_ignores_dead_claim(spark, tmp_path):
    """expire_snapshots must never treat an unreachable claim as the
    newest snapshot (that deleted the real CURRENT manifest + data)."""
    root = str(tmp_path / "t")
    df = synth.token_table(spark, 200, seed=3)
    encode_job.encode(spark, df, root, commit_groups=2, direct_write=True)
    _plant_dead_claim(root)

    maintenance.expire_snapshots(root, keep_last=1)
    # the real current snapshot and its data are intact
    assert SnapshotTable(root).current_snapshot() is not None
    assert decode_job.audit(df, decode_job.decode(spark, root), strict=True)["ok"]


def test_commit_skips_dead_claim(spark, tmp_path):
    """A dead claim must not wedge the table: the next commit claims an
    id past it, parent_id keeps the chain linked."""
    root = str(tmp_path / "t")
    df = synth.token_table(spark, 100, seed=4)
    encode_job.encode(spark, df, root, commit_groups=1, direct_write=True)
    tbl = SnapshotTable(root)
    before = tbl.current_snapshot()["snapshot_id"]
    dead_sid, _ = _plant_dead_claim(root)

    snap = tbl.commit({"extra": []}, metrics={})
    assert snap["snapshot_id"] > dead_sid
    assert snap["parent_id"] == before
    # chain() walks parent links, skipping the claim
    ids = [s["snapshot_id"] for s in tbl.chain()]
    assert ids == [before, snap["snapshot_id"]]
    assert dead_sid not in ids


def test_remove_orphans_ages_out_dead_claims(spark, tmp_path):
    import time

    root = str(tmp_path / "t")
    df = synth.token_table(spark, 100, seed=4)
    encode_job.encode(spark, df, root, commit_groups=1, direct_write=True)
    _, claim_path = _plant_dead_claim(root)

    res = maintenance.remove_orphan_files(root, older_than_hours=24)
    assert res["deleted_claim_manifests"] == 0  # age guard: too fresh
    past = time.time() - 48 * 3600
    os.utime(claim_path, (past, past))
    res = maintenance.remove_orphan_files(root, older_than_hours=24)
    assert res["deleted_claim_manifests"] == 1
    assert not os.path.exists(claim_path)
    assert decode_job.audit(df, decode_job.decode(spark, root))["ok"]


def test_split_doc_planning_survives_expiry(spark, tmp_path):
    """Split documents encoded in an early commit must still reassemble
    after the early manifests are expired away: the cumulative
    max_doc_parts_chain metric carries the maximum forward, so decode
    never silently returns partial rows."""
    root = str(tmp_path / "t")
    # commit 0+1: tiny budget forces doc splits (doc_parts > 1)
    df = synth.token_table(spark, 120, seed=5)
    encode_job.encode(spark, df, root, commit_groups=2,
                      max_chunk_tokens=64, direct_write=True)
    assert encode_job.read_pages(spark, root).filter("doc_parts > 1").count() > 0
    # later commit with no splits
    from tokencodec.spark import streaming
    src2 = str(tmp_path / "more")
    synth.token_table(spark, 30, seed=6).write.parquet(src2)
    streaming.encode_stream(spark, src2, root)

    maintenance.expire_snapshots(root, keep_last=1)
    # manifest-only planning still knows about the splits
    mdp = decode_job._max_doc_parts_from_manifest(root, None)
    assert mdp is not None and mdp > 1
    # and the decoded rows are the full original rows
    both = df.unionByName(spark.read.parquet(src2))
    assert decode_job.audit(both, decode_job.decode(spark, root), strict=True)["ok"]


def test_snapshots_order_numeric(tmp_path):
    """Numeric ordering holds past the 6-digit name padding."""
    root = str(tmp_path / "t")
    tbl = SnapshotTable(root)
    for sid in (999999, 1000000, 5):
        snap = {"snapshot_id": sid, "parent_id": None, "timestamp_ms": 0,
                "groups": {}, "new_groups": [], "metrics": {}}
        with open(os.path.join(root, "_manifest",
                               f"snapshot-{sid:06d}.json"), "w") as f:
            json.dump(snap, f)
    assert [s["snapshot_id"] for s in tbl.snapshots()] == [5, 999999, 1000000]
