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
