"""fsck: clean tables verify; corrupted pages are localized and named."""

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from tokencodec.spark import encode_job, fsck, synth


def test_fsck_clean_and_corrupt(spark, tmp_path):
    root = str(tmp_path / "enc")
    df = synth.token_table(spark, 300, seed=41)
    encode_job.encode(spark, df, root, commit_groups=1, n_salts=4)

    rep = fsck.fsck(spark, root)
    bad = rep.filter(~F.col("ok")).count()
    assert bad == 0
    assert rep.count() > 0

    # corrupt one page payload byte in one non-empty data file
    f = next(p for p in sorted(glob.glob(f"{root}/data/run-*/*.parquet"))
             if pq.ParquetFile(p).metadata.num_rows > 0)
    t = pq.read_table(f)
    pages = t.column("page_tokens").to_pylist()
    pages[0] = pages[0][:40] + bytes([pages[0][40] ^ 0xFF]) + pages[0][41:]
    t = t.set_column(t.column_names.index("page_tokens"), "page_tokens",
                     [pages])
    pq.write_table(t, f)
    # remove Hadoop's checksum sidecar so OUR page CRC layer is what
    # detects the corruption (on object stores there is no sidecar)
    import os
    crc = os.path.join(os.path.dirname(f), f".{os.path.basename(f)}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    rep2 = fsck.fsck(spark, root)
    bad_rows = rep2.filter(~F.col("ok")).collect()
    assert len(bad_rows) == 1
    assert "crc" in bad_rows[0].error.lower() or "mismatch" in bad_rows[0].error.lower()
