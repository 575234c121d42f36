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
