"""Mutable branch refs (SnapshotTable.create_branch /
maintenance.publish_branch): the write-audit-publish workflow on one
table root — fork, isolated commits, fast-forward publish, retention
holds through expiry/GC, and every refusal path."""

import json
import os
import posixpath

import pytest

from tokencodec.spark import decode_job, encode_job, maintenance
from tokencodec.spark.fsck import fsck
from tokencodec.spark.synth import token_table
from tokencodec.spark.table import SnapshotTable


def _prefixed(df, prefix):
    from pyspark.sql import functions as F
    return df.withColumn("doc_id", F.concat(F.lit(prefix), F.col("doc_id")))


@pytest.fixture(scope="module")
def base_table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("btab") / "root")
    df = token_table(spark, 400, seed=21)
    encode_job.encode(spark, df, root, commit_groups=1)
    return root, df


def test_branch_isolated_until_publish(spark, base_table, tmp_path):
    root, df = base_table
    tbl = SnapshotTable(root)
    tbl.create_branch("wap")
    df2 = _prefixed(token_table(spark, 150, seed=22), "b-")
    encode_job.encode(spark, df2, root, commit_groups=1,
                      group_prefix="wap", branch="wap")
    assert decode_job.decode(spark, root).count() == 400
    assert decode_job.decode(spark, root, branch="wap").count() == 550
    # audit the branch handle pre-publish (the WAP audit step)
    assert fsck(spark, root, branch="wap").where("ok = false").count() == 0
    res = decode_job.audit(df.unionByName(df2),
                           decode_job.decode(spark, root, branch="wap"))
    assert res["ok"]
    snap = maintenance.publish_branch(root, "wap")
    assert snap["metrics"]["published_branch"] == "wap"
    assert snap["metrics"]["n_rows"] == 150  # the delta, not the total
    assert decode_job.decode(spark, root).count() == 550
    res = decode_job.audit(df.unionByName(df2), decode_job.decode(spark, root))
    assert res["ok"]
    # branch survives publish by default and re-publish refuses (its
    # delta is now main's groups -> duplicate-key refusal)
    assert [b["name"] for b in tbl.branches()] == ["wap"]
    with pytest.raises(ValueError, match="already committed"):
        maintenance.publish_branch(root, "wap")
    tbl.drop_branch("wap")


def test_branch_totals_accumulate_from_fork(spark, base_table):
    root, _ = base_table
    tbl = SnapshotTable(root)
    tbl.create_branch("tot")
    df2 = _prefixed(token_table(spark, 80, seed=23), "t-")
    encode_job.encode(spark, df2, root, commit_groups=1,
                      group_prefix="tot", branch="tot")
    head = SnapshotTable(root, branch="tot").current_snapshot()
    fork = SnapshotTable(root, branch="tot").snapshot(0)
    h, f = (s["metrics"]["table_totals"] for s in (head, fork))
    assert h["n_rows"] - f["n_rows"] == 80
    assert f["n_rows"] == tbl.current_snapshot()["metrics"]["table_totals"]["n_rows"]
    tbl.drop_branch("tot")


def test_branch_name_and_existence_errors(spark, base_table):
    root, _ = base_table
    tbl = SnapshotTable(root)
    with pytest.raises(FileNotFoundError, match="no branch"):
        SnapshotTable(root, branch="nope")
    with pytest.raises(ValueError, match="invalid branch name"):
        tbl.create_branch("a/b")
    tbl.create_branch("dup")
    with pytest.raises(ValueError, match="already exists"):
        tbl.create_branch("dup")
    with pytest.raises(ValueError, match="from a branch handle"):
        SnapshotTable(root, branch="dup").create_branch("x")
    with pytest.raises(ValueError, match="no appended groups"):
        maintenance.publish_branch(root, "dup")
    tbl.drop_branch("dup")
    with pytest.raises(FileNotFoundError):
        tbl.drop_branch("dup")


def test_publish_refuses_mutated_shared_groups(spark, tmp_path):
    root = str(tmp_path / "mut")
    encode_job.encode(spark, token_table(spark, 120, seed=24), root,
                      commit_groups=1, max_chunk_tokens=3000)
    SnapshotTable(root).create_branch("cmp")
    # rewriting shared groups on the branch (compaction-style replace)
    br = SnapshotTable(root, branch="cmp")
    groups = br.committed_groups()
    k = sorted(groups)[0]
    br.commit({k: groups[k][:0]}, replace=True, metrics={})
    with pytest.raises(ValueError, match="rewrote shared groups"):
        maintenance.publish_branch(root, "cmp")


def test_publish_refuses_branch_delete_manifests(spark, tmp_path):
    root = str(tmp_path / "del")
    df = token_table(spark, 120, seed=25)
    encode_job.encode(spark, df, root, commit_groups=1)
    SnapshotTable(root).create_branch("dl")
    some_id = df.select("doc_id").head()[0]
    # a delete issued against the BRANCH handle: commit a del: group there
    ids_dir = str(tmp_path / "ids")
    spark.createDataFrame([(some_id,)], "doc_id string").write.parquet(ids_dir)
    paths = [posixpath.join(ids_dir, n) for n in os.listdir(ids_dir)
             if n.endswith(".parquet")]
    SnapshotTable(root, branch="dl").commit({"del:x": paths}, metrics={})
    with pytest.raises(ValueError, match="delete manifests"):
        maintenance.publish_branch(root, "dl")


def test_publish_onto_advanced_main(spark, tmp_path):
    root = str(tmp_path / "adv")
    encode_job.encode(spark, token_table(spark, 100, seed=26), root,
                      commit_groups=1)
    SnapshotTable(root).create_branch("late")
    encode_job.encode(spark, _prefixed(token_table(spark, 50, seed=27), "l-"),
                      root, commit_groups=1, group_prefix="late", branch="late")
    # main advances independently after the fork
    encode_job.encode(spark, _prefixed(token_table(spark, 60, seed=28), "m-"),
                      root, commit_groups=1, group_prefix="m2")
    maintenance.publish_branch(root, "late", drop=True)
    assert decode_job.decode(spark, root).count() == 210
    assert SnapshotTable(root).branches() == []


def test_branch_holds_retention_through_expiry_and_gc(spark, tmp_path):
    root = str(tmp_path / "hold")
    encode_job.encode(spark, token_table(spark, 100, seed=29), root,
                      commit_groups=1)
    SnapshotTable(root).create_branch("pin")
    encode_job.encode(spark, _prefixed(token_table(spark, 40, seed=30), "p-"),
                      root, commit_groups=1, group_prefix="pin", branch="pin")
    # advance and compact main so the branch's base files leave the
    # retained main chain
    encode_job.encode(spark, _prefixed(token_table(spark, 40, seed=31), "n-"),
                      root, commit_groups=1, group_prefix="n2")
    maintenance.compact(spark, root)
    maintenance.expire_snapshots(root, keep_last=1)
    maintenance.remove_orphan_files(root, older_than_hours=0.0)
    # the branch still reads its full fork-time + appended state
    assert decode_job.decode(spark, root, branch="pin").count() == 140
    assert fsck(spark, root, branch="pin").where("ok = false").count() == 0
    # dropping the branch releases the hold: its solely-referenced run
    # dirs become orphans on the next GC pass
    SnapshotTable(root).drop_branch("pin")
    rep = maintenance.remove_orphan_files(root, older_than_hours=0.0)
    assert rep["deleted_orphan_dirs"] >= 1
    assert decode_job.decode(spark, root).count() == 140  # main intact


def test_branch_cli_workflow(spark, base_table, tmp_path, capsys):
    from tokencodec.__main__ import main as cli
    root, _ = base_table
    assert cli(["branch", root, "cli"]) == 0
    assert cli(["branches", root]) == 0
    out = [json.loads(line) for line in
           capsys.readouterr().out.strip().splitlines()]
    assert any(b.get("name") == "cli" for b in out)
    assert cli(["drop-branch", root, "cli"]) == 0