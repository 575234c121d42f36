"""Oversized-document splitting (skew handling): a document larger than
the chunk token budget is split across chunks (bounded pages, never one
giant page) and reassembled bit-identically on decode."""

from pyspark.sql import functions as F

from tokencodec.spark import decode_job, encode_job, synth

BUDGET = 1 << 11  # 2048 tokens — ~4% of docs exceed it (lognormal tail)


def test_split_docs_roundtrip_and_bounded_pages(spark, tmp_path):
    root = str(tmp_path / "enc")
    df = synth.token_table(spark, 400, seed=51).cache()
    n_heavy = df.filter(F.col("n_tok") > BUDGET).count()
    assert n_heavy > 0, "fixture must contain oversized docs"

    encode_job.encode(spark, df, root, commit_groups=1, n_salts=4,
                      max_chunk_tokens=BUDGET)
    pages = encode_job.read_pages(spark, root)

    # every page is bounded by the budget — no giant pages
    assert pages.filter(F.col("n_tokens") > BUDGET).count() == 0
    split_parts = pages.filter(F.col("doc_parts") > 1)
    assert split_parts.count() >= 2 * n_heavy  # heavy docs produce >1 part

    # part accounting: parts per doc == doc_parts, token sums match
    acc = (split_parts.groupBy("doc_id_min", "doc_parts")
           .agg(F.count("*").alias("parts"), F.sum("n_tokens").alias("tok")))
    assert acc.filter(F.col("parts") != F.col("doc_parts")).count() == 0

    decoded = decode_job.decode(spark, root)
    assert decode_job.audit(df, decoded) == {"missing": 0, "extra": 0, "ok": True}


def test_split_doc_pruning_still_correct(spark, tmp_path):
    root = str(tmp_path / "enc")
    df = synth.token_table(spark, 300, seed=52).cache()
    encode_job.encode(spark, df, root, commit_groups=1, n_salts=4,
                      max_chunk_tokens=BUDGET)
    lo, hi = "doc-000000000050", "doc-000000000199"
    out = decode_job.decode(spark, root, doc_id_min=lo, doc_id_max=hi)
    expected = df.filter((F.col("doc_id") >= lo) & (F.col("doc_id") <= hi))
    assert decode_job.audit(expected, out) == {"missing": 0, "extra": 0, "ok": True}
