"""Structured Streaming encode: incremental catch-up runs commit new
source files only, and the decoded union matches the full input."""

from pyspark.sql import functions as F

from tokencodec.spark import decode_job, streaming, synth
from tokencodec.spark.table import SnapshotTable


def test_stream_encode_incremental(spark, tmp_path):
    src = str(tmp_path / "src")
    root = str(tmp_path / "enc")

    df1 = synth.token_table(spark, 150, seed=11)
    df1.write.mode("append").parquet(src)
    streaming.encode_stream(spark, src, root, max_chunk_tokens=1 << 16)
    snaps1 = SnapshotTable(root).snapshots()
    assert len(snaps1) >= 1

    # new files arrive; a second catch-up run encodes ONLY them
    df2 = synth.token_table(spark, 150, seed=12).withColumn(
        "doc_id", F.concat(F.lit("b-"), F.col("doc_id")))
    df2.write.mode("append").parquet(src)
    streaming.encode_stream(spark, src, root, max_chunk_tokens=1 << 16)
    snaps2 = SnapshotTable(root).snapshots()
    assert len(snaps2) > len(snaps1)

    decoded = decode_job.decode(spark, root)
    full = df1.unionByName(df2)
    assert decode_job.audit(full, decoded) == {"missing": 0, "extra": 0, "ok": True}


def test_stateful_dedup_stream(spark, tmp_path):
    """applyInPandasWithState dedup: first occurrence wins within a
    batch AND across restarts (state persisted in the checkpoint)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    base = synth.token_table(spark, 50, seed=3)
    dup = base.limit(10)
    base.unionAll(dup).write.mode("append").parquet(src)
    streaming.dedup_stream(spark, src, out)
    first = spark.read.parquet(out)
    assert first.count() == 50
    assert first.select("doc_id").distinct().count() == 50

    # second drop: 40 already-seen docs + 30 new ones
    synth.token_table(spark, 80, seed=3).write.mode("append").parquet(src)
    streaming.dedup_stream(spark, src, out)
    final = spark.read.parquet(out)
    assert final.count() == 80
    assert final.select("doc_id").distinct().count() == 80


def test_stateful_dedup_stream_ttl_suppresses_within_window(spark, tmp_path):
    """TTL variant, phase 1: a duplicate arriving well WITHIN the TTL
    is still suppressed (state alive), exactly like the permanent-state
    default."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    a = synth.token_table(spark, 5, seed=3)
    a.write.mode("append").parquet(src)
    streaming.dedup_stream(spark, src, out, ttl_ms=120_000)
    assert spark.read.parquet(out).count() == 5
    a.limit(3).write.mode("append").parquet(src)
    streaming.dedup_stream(spark, src, out, ttl_ms=120_000)
    assert spark.read.parquet(out).count() == 5


def test_stateful_dedup_stream_ttl_expiry_readmits(spark, tmp_path):
    """TTL variant, phase 2: state idle past the TTL is garbage-
    collected (ProcessingTimeTimeout — fires at the next micro-batch
    after the deadline, possibly in a later run via the checkpoint), so
    the same doc_id is re-admitted. This is what bounds total state for
    an unbounded key space."""
    import time

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    a = synth.token_table(spark, 5, seed=3)  # doc ids 0..4
    a.write.mode("append").parquet(src)
    streaming.dedup_stream(spark, src, out, ttl_ms=1200)
    assert spark.read.parquet(out).count() == 5

    # idle past the TTL, then a batch with an unrelated doc lets the
    # due timers fire and GC the expired keys
    time.sleep(2.5)
    synth.token_table(spark, 6, seed=3).filter("doc_id > 'doc-000000000004'") \
        .write.mode("append").parquet(src)
    streaming.dedup_stream(spark, src, out, ttl_ms=1200)
    assert spark.read.parquet(out).count() == 6

    # the original docs re-appear AFTER their state expired: re-admitted
    a.limit(2).write.mode("append").parquet(src)
    streaming.dedup_stream(spark, src, out, ttl_ms=1200)
    final = spark.read.parquet(out)
    assert final.count() == 8
    dup_ids = (final.groupBy("doc_id").agg(F.count("*").alias("k"))
               .filter("k = 2").count())
    assert dup_ids == 2


def test_stream_readd_after_delete_is_visible(spark, tmp_path):
    """Streaming micro-batch commits are sequence-attributed like any
    append: a doc deleted between catch-up runs and re-ingested by a
    LATER micro-batch is visible again (the delete masks only
    strictly-older rows), and purge then removes exactly the old copy."""
    from tokencodec.spark import maintenance
    src = str(tmp_path / "src")
    root = str(tmp_path / "enc")
    df1 = synth.token_table(spark, 120, seed=21).cache()
    df1.write.mode("append").parquet(src)
    streaming.encode_stream(spark, src, root, max_chunk_tokens=1 << 16)

    gone = [r[0] for r in df1.select("doc_id").orderBy("doc_id")
            .limit(2).collect()]
    maintenance.delete_docs(spark, root, gone)
    assert (decode_job.decode(spark, root)
            .filter(F.col("doc_id").isin(gone)).count() == 0)

    # the same ids return in a later micro-batch with NEW token streams
    readd = (df1.filter(F.col("doc_id").isin(gone))
             .withColumn("tokens", F.reverse("tokens")))
    readd.write.mode("append").parquet(src)
    streaming.encode_stream(spark, src, root, max_chunk_tokens=1 << 16)

    exp = (df1.filter(~F.col("doc_id").isin(gone))
           .unionByName(readd))
    out = decode_job.decode(spark, root)
    assert decode_job.audit(exp, out) == {"missing": 0, "extra": 0,
                                          "ok": True}
    maintenance.purge_deletes(spark, root)
    out2 = decode_job.decode(spark, root)
    assert decode_job.audit(exp, out2) == {"missing": 0, "extra": 0,
                                           "ok": True}
