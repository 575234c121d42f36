"""Deterministic run-detection checks for q_rle_runs_returnflag's
distributed gaps-and-islands plan: every case forces runs that SPAN
range-partition boundaries, so the boundary-stitch logic is exercised
by construction (the sf-data oracle test only covers it by chance)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

from pyspark.sql import functions as F

N = 10_000


def _mk_lineitem(spark, tmp_path, flag_expr):
    df = (spark.range(N)
          .select(F.col("id").alias("l_orderkey"),
                  F.lit(1).alias("l_linenumber"),
                  flag_expr.alias("l_returnflag"),
                  (F.col("id") % 7).alias("l_partkey"),
                  (F.col("id") % 5).alias("l_suppkey"),
                  (F.col("id") % 11).cast("double").alias("l_extendedprice")))
    path = str(tmp_path)
    df.repartition(8).write.mode("overwrite").parquet(os.path.join(path, "lineitem.parquet"))
    return path


def _runs(spark, sf_dir):
    rows = entrymod.q_rle_runs_returnflag(spark, sf_dir).collect()
    return {r.l_returnflag: (r.n_runs, r.max_run, r.n_values) for r in rows}


def test_single_giant_run(spark, tmp_path):
    """Constant flag: one run of N spanning every partition boundary."""
    d = _mk_lineitem(spark, tmp_path, F.lit("A"))
    assert _runs(spark, d) == {"A": (1, N, N)}


def test_alternating_runs(spark, tmp_path):
    """Alternating flag in key order: N runs of length 1, none merge."""
    d = _mk_lineitem(spark, tmp_path,
                     F.when(F.col("id") % 2 == 0, "A").otherwise("B"))
    assert _runs(spark, d) == {"A": (N // 2, 1, N // 2), "B": (N // 2, 1, N // 2)}


def test_block_runs_span_boundaries(spark, tmp_path):
    """Blocks of 100: runs land on arbitrary partition boundaries."""
    d = _mk_lineitem(spark, tmp_path,
                     F.when((F.col("id") / 100).cast("int") % 2 == 0, "A").otherwise("B"))
    assert _runs(spark, d) == {"A": (N // 200, 100, N // 2),
                               "B": (N // 200, 100, N // 2)}


def test_random_flags_match_bruteforce(spark, tmp_path):
    """Random flag sequences at several partition counts must match a
    pure-python gaps-and-islands computation exactly."""
    import itertools
    import random

    rng = random.Random(1234)
    n = 5000
    flags = []
    i = 0
    while i < n:
        f = rng.choice("ABC")
        run = rng.choice([1, 1, 1, 2, 3, 8, 40, 300])
        flags.extend([f] * min(run, n - i))
        i += run
    flags = flags[:n]

    # brute force
    expected = {}
    for f, grp in itertools.groupby(flags):
        L = len(list(grp))
        nr, mx, nv = expected.get(f, (0, 0, 0))
        expected[f] = (nr + 1, max(mx, L), nv + L)

    df = (spark.createDataFrame([(i, flags[i]) for i in range(n)],
                                "l_orderkey bigint, l_returnflag string")
          .select("l_orderkey", F.lit(1).alias("l_linenumber"), "l_returnflag",
                  F.lit(2).alias("l_partkey"), F.lit(3).alias("l_suppkey"),
                  F.lit(4.0).alias("l_extendedprice")))
    d = str(tmp_path)
    df.repartition(16).write.mode("overwrite").parquet(
        os.path.join(d, "lineitem.parquet"))
    for parts in ("5", "32"):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            got = _runs(spark, d)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        assert got == expected, (parts, got, expected)


def test_striped_keys_balance_and_match_bruteforce(spark, tmp_path):
    """Round-6 skew fix: id-shifted striped key spaces (the @Mx bench
    shape — stripes separated by huge gaps) must (a) still produce the
    exact oracle answer and (b) split into one dense segment per
    stripe so buckets balance by row mass instead of collapsing into
    one hot bucket per stripe."""
    parts = []
    for i in range(4):
        parts.append(
            spark.range(2000)
            .select((F.col("id") + i * 10**12).alias("l_orderkey"),
                    F.lit(1).alias("l_linenumber"),
                    F.when((F.col("id") / 5).cast("int") % 2 == 0, "A")
                    .otherwise("B").alias("l_returnflag"),
                    F.lit(0).alias("l_partkey"), F.lit(0).alias("l_suppkey"),
                    F.lit(0.0).alias("l_extendedprice")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    path = str(tmp_path)
    # one file per stripe, like the bench's scaled tables
    for i, p in enumerate(parts):
        p.coalesce(1).write.mode("append").parquet(
            os.path.join(path, "lineitem.parquet"))
    segs = entrymod._footer_key_segments(path, "lineitem", "l_orderkey")
    assert segs is not None and len(segs) == 4
    assert [s[2] for s in segs] == [2000] * 4
    # bucket expr is monotone in the key and spreads each stripe
    bkt = entrymod._segment_bucket_expr(F.col("l_orderkey"), segs, 128)
    rows = (u.select("l_orderkey", bkt.alias("b"))
            .orderBy("l_orderkey").collect())
    bs = [r["b"] for r in rows]
    assert bs == sorted(bs)
    assert len(set(bs)) > 32  # not a handful of hot buckets
    # exact answer vs brute force on the collected flag sequence
    flags = [r for _, r in sorted(
        (rr["l_orderkey"], rr["l_returnflag"]) for rr in u.collect())]
    runs = []
    for f in flags:
        if runs and runs[-1][0] == f:
            runs[-1][1] += 1
        else:
            runs.append([f, 1])
    want = {}
    for f, ln in runs:
        n, mx, tot = want.get(f, (0, 0, 0))
        want[f] = (n + 1, max(mx, ln), tot + ln)
    got = {r["l_returnflag"]: (r["n_runs"], r["max_run"], r["n_values"])
           for r in entrymod.q_rle_runs_returnflag(spark, path).collect()}
    assert got == want
