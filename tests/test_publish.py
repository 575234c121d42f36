"""Write-audit-publish (publish_staged): adopting an audited staging
table's groups into the main table via one metadata-only commit —
correctness of the merged read, the uid-namespace collision guard, the
delete/scheme refusals, extra-schema merge, and staging retirement."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tokencodec.spark import decode_job, encode_job, maintenance, synth
from tokencodec.spark.table import SnapshotTable


def _halves(spark, n=80, seed=11):
    full = synth.token_table(spark, n, seed=seed)
    a = full.limit(n // 2)
    b = full.subtract(a)
    return full, a, b


def test_publish_merges_and_retires(spark, tmp_path):
    main = str(tmp_path / "main")
    stage = str(tmp_path / "stage")
    full, a, b = _halves(spark, 80)
    encode_job.encode(spark, a, main, commit_groups=1, max_chunk_tokens=512)
    encode_job.encode(spark, b, stage, commit_groups=1, max_chunk_tokens=512,
                      group_prefix="h")
    # the AUDIT step of write-audit-publish, in isolation
    assert decode_job.audit(b, decode_job.decode(spark, stage))["ok"]
    main_tt = SnapshotTable(main).current_snapshot()["metrics"]["table_totals"]
    stage_tt = SnapshotTable(stage).current_snapshot()["metrics"]["table_totals"]

    snap = maintenance.publish_staged(main, stage)
    assert "h0" in snap["groups"] and "g0" in snap["groups"]
    # merged read is bit-identical to the union
    assert decode_job.audit(full, decode_job.decode(spark, main),
                            strict=True)["ok"]
    # totals accumulated without any scan: exactly main + staging
    tt = snap["metrics"]["table_totals"]
    assert tt == {k: main_tt[k] + stage_tt[k] for k in tt}
    # staging manifests retired: ownership transferred
    assert SnapshotTable(stage).current_snapshot() is None
    # main's maintenance still owns the adopted files end-to-end
    assert decode_job.audit(full, decode_job.decode(spark, main))["ok"]


def test_published_groups_are_first_class_for_maintenance(spark, tmp_path):
    """Adopted groups must behave exactly like natively encoded ones:
    compaction rewrites them and the audit stays bit-identical."""
    main = str(tmp_path / "main")
    stage = str(tmp_path / "stage")
    full, a, b = _halves(spark, 80, seed=17)
    encode_job.encode(spark, a, main, commit_groups=1, max_chunk_tokens=64)
    encode_job.encode(spark, b, stage, commit_groups=1, max_chunk_tokens=64,
                      group_prefix="h")
    maintenance.publish_staged(main, stage)
    pre = SnapshotTable(main).current_snapshot()["metrics"]["table_totals"]
    maintenance.compact(spark, main, max_chunk_tokens=1 << 20)
    post = SnapshotTable(main).current_snapshot()["metrics"]["table_totals"]
    assert post["n_chunks"] < pre["n_chunks"]
    assert decode_job.audit(full, decode_job.decode(spark, main),
                            strict=True)["ok"]


def test_publish_refuses_uid_namespace_collision(spark, tmp_path):
    main = str(tmp_path / "main")
    stage = str(tmp_path / "stage")
    _, a, b = _halves(spark, 60)
    encode_job.encode(spark, a, main, commit_groups=1, max_chunk_tokens=512)
    # staging encoded with the DEFAULT prefix: group key g0 == main's
    encode_job.encode(spark, b, stage, commit_groups=1, max_chunk_tokens=512)
    with pytest.raises(ValueError, match="already committed"):
        maintenance.publish_staged(main, stage)
    # refusal left both tables untouched
    assert decode_job.audit(a, decode_job.decode(spark, main))["ok"]
    assert SnapshotTable(stage).current_snapshot() is not None


def test_publish_refuses_deletes_and_empty(spark, tmp_path):
    main = str(tmp_path / "main")
    stage = str(tmp_path / "stage")
    _, a, b = _halves(spark, 60)
    encode_job.encode(spark, a, main, commit_groups=1, max_chunk_tokens=512)
    with pytest.raises(ValueError, match="no\\s+committed snapshot"):
        maintenance.publish_staged(main, str(tmp_path / "nothing"))
    encode_job.encode(spark, b, stage, commit_groups=1, max_chunk_tokens=512,
                      group_prefix="h")
    maintenance.delete_docs(spark, stage, b.limit(1).select("doc_id"))
    with pytest.raises(ValueError, match="delete manifests"):
        maintenance.publish_staged(main, stage)


def test_publish_refuses_scheme_mismatch(spark, tmp_path):
    main = str(tmp_path / "main")
    stage = str(tmp_path / "stage")
    _, a, b = _halves(spark, 60)
    encode_job.encode(spark, a, main, commit_groups=1, max_chunk_tokens=512,
                      n_salts=4)
    encode_job.encode(spark, b, stage, commit_groups=1, max_chunk_tokens=512,
                      n_salts=8, group_prefix="h")
    with pytest.raises(ValueError, match="scheme"):
        maintenance.publish_staged(main, stage)


def test_publish_merges_extra_schema(spark, tmp_path):
    main = str(tmp_path / "main")
    stage = str(tmp_path / "stage")
    full, a, b = _halves(spark, 60, seed=13)
    encode_job.encode(spark, a, main, commit_groups=1, max_chunk_tokens=512)
    b_x = b.withColumn("rank", F.length("doc_id").cast("int"))
    encode_job.encode(spark, b_x, stage, commit_groups=1,
                      max_chunk_tokens=512, group_prefix="h")
    maintenance.publish_staged(main, stage)
    out = decode_job.decode(spark, main)
    assert "rank" in out.columns
    # staged rows carry the value, pre-publish main rows back-fill NULL
    assert out.filter(F.col("rank").isNotNull()).count() == b.count()
    assert out.filter(F.col("rank").isNull()).count() == a.count()


def test_publish_accepts_purged_deletes(spark, tmp_path):
    """ADVICE r5 #1: only ACTIVE delete manifests refuse. A staging
    table whose deletes were purged (purge_deletes leaves the del:* key
    behind as an empty list forever) must publish — the former check
    made any staging table that ever committed a delete permanently
    unpublishable, even after following the error's own advice."""
    main = str(tmp_path / "main")
    stage = str(tmp_path / "stage")
    _, a, b = _halves(spark, 60)
    encode_job.encode(spark, a, main, commit_groups=1, max_chunk_tokens=512)
    encode_job.encode(spark, b, stage, commit_groups=1, max_chunk_tokens=512,
                      group_prefix="h")
    victim = b.orderBy("doc_id").limit(1).select("doc_id")
    maintenance.delete_docs(spark, stage, victim)
    maintenance.purge_deletes(spark, stage)
    # the del:* key survives purge as an empty list — must not refuse
    assert any(k.startswith("del:") and not ps for k, ps in
               SnapshotTable(stage).committed_groups().items())
    snap = maintenance.publish_staged(main, stage)
    # exhausted del keys are not adopted into main's namespace
    assert not any(k.startswith("del:") for k in snap["groups"])
    merged = decode_job.decode(spark, main)
    want = a.unionByName(b.join(victim, "doc_id", "left_anti"))
    assert decode_job.audit(want, merged)["ok"]
