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


def test_many_part_doc_reassembles_packed_and_list(spark, tmp_path):
    """A 64-part oversized doc reassembles bit-identically in BOTH token
    representations. The packed path is the VERDICT r3 quadratic corner:
    reassembly is now a linear Arrow-stage stitch (one np.concatenate
    per doc), so part count only costs O(total bytes)."""
    import numpy as np

    from pyspark.sql import functions as F

    root = str(tmp_path / "t64")
    n = 64 * 100  # 64 parts at a 100-token budget
    toks = [int(x) for x in np.arange(n) % 251]
    df = spark.createDataFrame(
        [("big-0", toks, n, "web"), ("small-0", [7, 8, 9], 3, "web")],
        "doc_id string, tokens array<int>, n_tok int, source string")
    encode_job.encode(spark, df, root, commit_groups=1, n_salts=1,
                      max_chunk_tokens=100)
    parts = (encode_job.read_pages(spark, root)
             .filter("doc_parts > 1").agg(F.max("doc_parts")).collect()[0][0])
    assert parts == 64
    assert decode_job.audit(df, decode_job.decode(spark, root), strict=True)["ok"]
    # packed: same bytes as packing the original ints little-endian
    got = {r.doc_id: bytes(r.tokens)
           for r in decode_job.decode(spark, root, packed=True).collect()}
    assert got["big-0"] == np.array(toks, dtype="<i4").tobytes()
    assert got["small-0"] == np.array([7, 8, 9], dtype="<i4").tobytes()
    # projection-only decode still yields one identity row per doc
    ids = sorted(r.doc_id for r in
                 decode_job.decode(spark, root, columns=["doc_id"]).collect())
    assert ids == ["big-0", "small-0"]
    # n_tok-only decode sums the parts
    nt = {r.doc_id: r.n_tok for r in decode_job.decode(
        spark, root, columns=["doc_id", "n_tok"]).collect()}
    assert nt == {"big-0": n, "small-0": 3}
