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
