"""Hot-band safety for the MinHash+LSH dedup query: a degenerate band
bucket (here: many identical docs sharing every band) must be dropped by
the cap instead of exploding into B^2 candidate pairs."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

from pyspark.sql import functions as F


def _mk_docs(spark, tmp_path, n_hot=50):
    hot = spark.range(n_hot).select(
        F.col("id").alias("doc_id"),
        F.lit("the same short document repeated everywhere").alias("text"))
    i = F.col("id").cast("string")
    cold = spark.range(n_hot, n_hot + 5).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), i, F.lit("a w"), i, F.lit("b w"), i,
                 F.lit("c w"), i, F.lit("d")).alias("text"))
    d = str(tmp_path)
    hot.unionByName(cold).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet"))
    return d


def test_hot_band_capped(spark, tmp_path):
    d = _mk_docs(spark, tmp_path, n_hot=50)
    uncapped = entrymod.q_dedup_minhash_lsh(spark, d, band_cap=1000)
    assert uncapped.count() == 50 * 49 // 2  # quadratic blow-up
    capped = entrymod.q_dedup_minhash_lsh(spark, d, band_cap=10)
    assert capped.count() == 0  # hot bucket dropped, nothing quadratic


def test_cap_keeps_small_buckets(spark, tmp_path):
    d = _mk_docs(spark, tmp_path, n_hot=4)
    pairs = entrymod.q_dedup_minhash_lsh(spark, d, band_cap=10)
    rows = pairs.collect()
    assert len(rows) == 4 * 3 // 2
    assert all(r.jaccard == 1.0 for r in rows)


def test_dedup_clusters_known_components(spark, tmp_path):
    """Two duplicate groups + singletons -> exact expected components."""
    a = spark.range(3).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon").alias("text"))
    b = spark.range(10, 12).select(
        F.col("id").alias("doc_id"),
        F.lit("zeta eta theta iota kappa").alias("text"))
    i = F.col("id").cast("string")
    single = spark.range(20, 22).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), i, F.lit("a s"), i, F.lit("b s"), i, F.lit("c")).alias("text"))
    d = str(tmp_path)
    a.unionByName(b).unionByName(single).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet"))
    rows = {r.cluster: r.n_docs for r in entrymod.q_dedup_clusters(spark, d).collect()}
    assert rows == {0: 3, 10: 2, 20: 1, 21: 1}
