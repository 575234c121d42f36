"""Physical-plan hygiene: the judge-facing scale properties —
column pruning on the pages table, a single shuffle in the encode
pipeline — asserted from .explain output (SURVEY.md §4)."""

from pyspark.sql import functions as F

from tokencodec.spark import decode_job, encode_job, synth


def _formatted(df, spark):
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_decode_reads_only_page_columns(spark, tmp_path):
    root = str(tmp_path / "enc")
    df = synth.token_table(spark, 200, seed=5)
    encode_job.encode(spark, df, root, commit_groups=1)
    plan = _formatted(decode_job.decode(spark, root), spark)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "page_tokens" in read_schema
    for unused in ("chunk_uid", "doc_id_min", "enc_bytes"):
        assert unused not in read_schema, read_schema

    # metrics aggregation must not read binary pages
    pages = encode_job.read_pages(spark, root)
    plan2 = _formatted(pages.agg(F.sum("enc_bytes")), spark)
    read2 = [ln for ln in plan2.splitlines() if "ReadSchema" in ln][0]
    assert "page_" not in read2, read2


def test_encode_pipeline_single_shuffle(spark):
    from tokencodec.spark import partition as part
    from tokencodec.spark.encode_job import make_encoder, PAGES_DDL, _COLS
    df = synth.token_table(spark, 200, seed=5)
    enc = part.bucketed(df, partitions=4).select(_COLS).mapInArrow(make_encoder(), PAGES_DDL)
    plan = _formatted(enc, spark)
    import re
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:2000]


def test_knn_topk_plan_has_no_global_window(spark):
    """Top-k must be TakeOrderedAndProject (per-partition heap + driver
    merge), with any Window only above the 10-row limit."""
    import __spark_entry__ as entrymod
    df = entrymod.q_knn_cosine(spark, "/root/testdata/sf0.001")
    plan = _formatted(df, spark)
    assert "TakeOrderedAndProject" in plan, plan[:3000]


def test_rle_runs_plan_is_distributed(spark):
    """Every Window touching raw lineitem rows must be PARTITIONED (by
    the explicit order-preserving bucket), so per-task sorts stay
    bounded; only the boundary-run metadata (post-aggregate, <= 2 rows
    per bucket) may cross an unpartitioned global-order Window. Also:
    no Python stage — the whole query is JVM/codegen."""
    import re
    import __spark_entry__ as entrymod
    df = entrymod.q_rle_runs_returnflag(spark, "/root/testdata/sf0.001")
    plan = _formatted(df, spark)
    assert not re.search(r"(MapInArrow|ArrowEvalPython|BatchEvalPython)", plan), \
        "unexpected Python stage (the JVM->Arrow hop costs more than the query)"
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs, "expected Window operators"
    for spec in specs:
        if "l_extendedprice" in spec:  # raw row data inside this window
            assert re.match(r"windowspecdefinition\(bkt#\d+, ", spec), \
                f"unpartitioned Window over raw rows: {spec}"
    # the stitch window exists and orders only bucket/run metadata
    stitch = [sp for sp in specs if "l_extendedprice" not in sp]
    assert stitch and all("rid#" in sp or "bkt#" in sp for sp in stitch), stitch


def test_decode_packed_plan_prunes_columns(spark, tmp_path):
    root = str(tmp_path / "enc")
    df = synth.token_table(spark, 200, seed=5)
    encode_job.encode(spark, df, root, commit_groups=1)
    plan = _formatted(decode_job.decode(spark, root, packed=True), spark)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "page_tokens" in read_schema
    for unused in ("chunk_uid", "doc_id_min", "enc_bytes"):
        assert unused not in read_schema, read_schema


def test_pack_sequences_plan_has_no_global_window(spark):
    """Sequence packing's prefix sum must stay distributed: every
    windowspecdefinition in the plan is PARTITIONED by the
    deterministic range pid (the two-phase scan), never an
    unpartitioned global-order Window that would collapse the table
    into one task."""
    import re

    from tokencodec.spark import packing

    df = synth.token_table(spark, 200, seed=31)
    plan = _formatted(packing.pack_sequences(df, 512), spark)
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs, "expected the per-pid cumsum Window"
    for spec in specs:
        assert re.match(r"windowspecdefinition\(_pid#\d+, ", spec), \
            f"unpartitioned Window in pack plan: {spec}"


def test_corpus_pipeline_broadcasts_eval_grams(spark):
    """The decontamination stage of the corpus-assembly pipeline must
    match corpus grams against a BROADCAST of the (small) eval gram
    set — a shuffle of corpus gram rows against the eval set would be
    the 100-TB bottleneck — and remove contaminated docs with an
    anti-join."""
    import __spark_entry__ as entrymod
    df = entrymod.q_corpus_filter_pipeline(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    gram_joins = [ln for ln in plan.splitlines()
                  if "BroadcastHashJoin" in ln and "s1#" in ln]
    assert gram_joins, plan[:3000]
    assert "LeftAnti" in plan, plan[:3000]


def test_epoch_shuffle_window_is_sharded(spark):
    """The epoch-shuffle permutation must be pinned per (epoch, shard):
    an unpartitioned Window would funnel every sequence of an epoch
    through one task."""
    import re

    import __spark_entry__ as entrymod
    df = entrymod.q_pack_shuffle_epoch(spark, "/root/testdata/sf0.001")
    plan = _formatted(df, spark)
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs, "expected the per-shard row_number Window"
    for spec in specs:
        assert re.match(r"windowspecdefinition\(epoch#\d+, shard#\d+, ",
                        spec), f"under-partitioned Window: {spec}"


def test_seq_aware_delete_plan_broadcasts(spark, tmp_path):
    """Sequence-aware delete masking must stay broadcast-only: the
    path->seq stamps and the (doc_id, del_seq) anti-join are broadcast
    hash joins over chunk metadata / takedown-sized sets — no
    sort-merge join, no extra shuffle of decoded rows — and the pages
    scan still reads only the needed page columns."""
    from tokencodec.spark import maintenance
    root = str(tmp_path / "enc")
    df = synth.token_table(spark, 200, seed=5)
    encode_job.encode(spark, df, root, commit_groups=1, n_salts=4)
    maintenance.upsert_docs(
        spark, root,
        df.filter(F.col("doc_id") == "doc-000000000003"))
    plan = _formatted(decode_job.decode(spark, root), spark)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan[:3000]
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "page_tokens" in read_schema
