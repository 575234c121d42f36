"""Benchmark decontamination (VERDICT r4 next #2): 13-gram overlap of a
corpus against a held-out eval set, with a planted-contamination fixture
proving detection is exact (hit position, span, and count — not just
membership). The sf-dir query variant is oracle-checked in
test_queries_oracle.py; here the fixture controls ground truth."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

N = entrymod._DECON_N  # 13


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def _run(spark, tmp_path, rows):
    """Drive q_text_decontaminate against a synthetic documents table by
    pointing the sf_dir at a temp directory."""
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    _docs(spark, rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet"))
    return {r["doc_id"]: r for r in
            entrymod.q_text_decontaminate(spark, sf).collect()}


def words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_planted_contamination_detected_exactly(spark, tmp_path):
    eval_text = words("ev", 30)                 # doc 0: the "benchmark"
    clean = words("clean", 40)                  # disjoint vocabulary
    # doc 1: plants eval words [5..5+N) at corpus positions [10..10+N)
    plant = (words("pre", 10) + " "
             + " ".join(f"ev{i}" for i in range(5, 5 + N)) + " "
             + words("post", 8))
    out = _run(spark, tmp_path, [
        (0, eval_text, "eval"),      # doc_id % 7 == 0 -> eval set
        (1, plant, "web"),
        (2, clean, "web"),
    ])
    assert 2 not in out and 0 not in out
    hit = out[1]
    # exactly ONE 13-gram matches (the planted window), at pos 10
    assert hit["n_contam"] == 1
    assert hit["span_lo"] == 10 and hit["span_hi"] == 10 + N - 1
    assert hit["n_grams"] == 10 + N + 8 - N + 1


def test_near_miss_is_not_contamination(spark, tmp_path):
    # only N-1 consecutive eval words: no full 13-gram overlap
    near = (words("pre", 4) + " "
            + " ".join(f"ev{i}" for i in range(N - 1)) + " "
            + words("post", 20))
    out = _run(spark, tmp_path, [
        (0, words("ev", 30), "eval"),
        (1, near, "web"),
    ])
    assert out == {}


def test_multispan_counts_every_gram(spark, tmp_path):
    # the whole eval doc replayed inside a longer corpus doc: every
    # window of the replay matches; span covers the replayed region
    eval_text = words("ev", 20)  # 8 grams of width 13
    host = words("pre", 6) + " " + eval_text + " " + words("post", 5)
    out = _run(spark, tmp_path, [
        (0, eval_text, "eval"),
        (3, host, "web"),
    ])
    hit = out[3]
    assert hit["n_contam"] == 20 - N + 1
    assert hit["span_lo"] == 6 and hit["span_hi"] == 6 + 20 - 1


def test_short_docs_ignored(spark, tmp_path):
    out = _run(spark, tmp_path, [
        (0, words("ev", 30), "eval"),
        (1, " ".join(f"ev{i}" for i in range(N - 1)), "web"),  # < N words
    ])
    assert out == {}
