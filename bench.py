"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline = the engine itself (encode / decode / audit on a token table
sized from the sf dir) plus representative pipeline queries
(dedup, knn, RLE-runs). Extra JSON keys report tokens/sec, compression
ratio vs Spark's own uncompressed parquet, and codec mix.

Measurement protocol (every published wall states which one it used):
- `q_*`            : FRESH-PLAN wall, min of `reps` — each rep rebuilds
                     the DataFrame, so Catalyst analysis/optimization/
                     codegen is included. This is what a first call
                     pays.
- `q_*_steady`     : STEADY-STATE wall, min of `reps` re-executions of
                     one built DataFrame — the per-novel-plan Catalyst
                     constant amortized away; what a long-lived job
                     repeating a query shape pays.
- `q_*@{M}x`       : same fresh-plan protocol at an M-x larger token
                     corpus (engine queries only) — at sf0.1 the base
                     walls are overhead-dominated, so round-over-round
                     deltas are measured here. Disable with
                     TOKENCODEC_BENCH_BIG_MULT=0.

Scaling evidence (N vs 4N) lives in bench_scaling.py (separate
processes — a JVM can't change master).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROWS_PER_DOC = int(os.environ.get("TOKENCODEC_BENCH_ROW_FACTOR", "8"))
BIG_MULT = int(os.environ.get("TOKENCODEC_BENCH_BIG_MULT", "4"))
SEED = 42


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from tokencodec.spark import decode_job, encode_job, synth
    from tokencodec.spark.session import get_spark

    spark = get_spark("tokencodec-bench", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float] = {}

    def timed(name, fn, reps=1):
        """min-of-reps wall: executors are long-lived on a real cluster,
        so steady-state capability is the honest per-query number (this
        host's run-to-run noise is up to 6x — see BASELINE.md)."""
        best, r = None, None
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn()
            w = time.perf_counter() - t0
            best = w if best is None or w < best else best
        times[name] = round(best, 3)
        return r

    n_docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).count()
    n_rows = n_docs * ROWS_PER_DOC

    # materialize the source token table once (the "Iceberg table" stand-in)
    src = f"/tmp/tokencodec_bench/src_n{n_rows}_s{SEED}"
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        synth.token_table(spark, n_rows, seed=SEED).write.mode("overwrite").parquet(src)
    df = spark.read.parquet(src)

    root = f"/tmp/tokencodec_bench/enc_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)

    def fresh_encode():
        shutil.rmtree(root, ignore_errors=True)
        return encode_job.encode_from_parquet(spark, src, root, commit_groups=1)

    timed("q_encode", fresh_encode, reps=3)
    pages = encode_job.read_pages(spark, root)
    agg = pages.agg(F.sum("n_tokens").alias("t"), F.sum("raw_bytes").alias("r"),
                    F.sum("enc_bytes").alias("e"), F.count("*").alias("c")).collect()[0]

    # headline decode: packed binary-blob output (tokens cross the
    # Python->JVM boundary as bulk buffers, not per-element arrays);
    # list decode timed alongside for the API-default number
    timed("q_decode", lambda: decode_job.decode(spark, root, packed=True).count(),
          reps=3)
    timed("q_decode_list", lambda: decode_job.decode(spark, root).count(), reps=3)
    # audit consumes blobs on both sides: packed source vs packed decode,
    # one aggregate pass per side (no row shuffle)
    audit = timed("q_audit", lambda: decode_job.audit(
        encode_job.pack_source(spark, src),
        decode_job.decode(spark, root, packed=True)), reps=2)

    # exact-id lookups (round-5 session 5): salt derivation + per-chunk
    # Bloom pruning leave ~1 chunk (resp. ~1 per target) to parse — the
    # wall is planning + metadata filter + single-chunk decode, and at
    # design scale it is INDEPENDENT of table size (1/n_salts metadata,
    # Bloom-filtered chunk list), unlike a scan
    timed("q_point_lookup", lambda: decode_job.decode(
        spark, root, doc_id_min=f"doc-{123:012d}",
        doc_id_max=f"doc-{123:012d}").count(), reps=3)
    timed("q_batch_lookup", lambda: decode_job.decode(
        spark, root, doc_ids=[f"doc-{3:012d}", f"doc-{123:012d}",
                              f"doc-{n_rows - 1:012d}"]).count(), reps=3)

    # reference parquet (uncompressed Spark writer — the baseline artifact)
    ref = f"/tmp/tokencodec_bench/ref_{os.getpid()}"
    timed("q_ref_parquet_write",
          lambda: df.write.mode("overwrite").option("compression", "uncompressed").parquet(ref))
    ref_bytes = sum(os.path.getsize(os.path.join(ref, p))
                    for p in os.listdir(ref) if p.endswith(".parquet"))

    # representative pipeline queries (same impls the driver checks)
    q = entrymod.queries()
    # reps=4: these queries are sub-second warm but compile ~10 codegen
    # stages each — two reps still measures the JIT, not the query.
    # Each fresh rep rebuilds the plan; the _steady twin re-executes one
    # built DataFrame (protocols in the module docstring).
    # benchmark hygiene: the encode/audit block above leaves the JVM
    # heap full of shuffle/codegen garbage whose collection otherwise
    # lands inside the first sub-second query timings
    spark.sparkContext._jvm.System.gc()
    for name in ["dedup_minhash", "knn_cosine", "rle_runs_returnflag",
                 "text_fingerprint", "dedup_simhash", "text_decontaminate"]:
        timed(f"q_{name}", lambda n=name: q[n](spark, SF_DIR).count(), reps=4)
        built = q[name](spark, SF_DIR)
        built.count()  # absorb the first-execution cost
        timed(f"q_{name}_steady", built.count, reps=4)

    # sequence packing over the bench token table (round-5 operator):
    # distributed prefix sum + span explode + per-sequence assembly
    from tokencodec.spark import packing
    timed("q_pack_sequences",
          lambda: packing.pack_sequences(df, 2048).count(), reps=2)

    codec_mix = {r[0]: r[1] for r in
                 pages.groupBy("tokens_codec").count().orderBy("tokens_codec").collect()}
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(ref, ignore_errors=True)

    # Larger-corpus engine walls (VERDICT r3 next #9): at sf0.1 the base
    # walls sit on fixed costs (the ~0.9 s inbound Arrow hop, task
    # launch), so a BIG_MULT-x corpus is where encode/decode deltas
    # measure the engine. Pipeline queries keep the sf tables; only the
    # token-table engine paths scale with n_rows.
    big = None
    if BIG_MULT > 1:
        big_rows = n_rows * BIG_MULT
        big_src = f"/tmp/tokencodec_bench/src_n{big_rows}_s{SEED}"
        if not os.path.exists(os.path.join(big_src, "_SUCCESS")):
            synth.token_table(spark, big_rows, seed=SEED) \
                .write.mode("overwrite").parquet(big_src)
        big_root = f"/tmp/tokencodec_bench/encbig_{os.getpid()}"

        def fresh_encode_big():
            shutil.rmtree(big_root, ignore_errors=True)
            return encode_job.encode_from_parquet(spark, big_src, big_root,
                                                  commit_groups=1)

        timed(f"q_encode@{BIG_MULT}x", fresh_encode_big, reps=2)
        timed(f"q_decode@{BIG_MULT}x",
              lambda: decode_job.decode(spark, big_root, packed=True).count(),
              reps=2)
        timed(f"q_audit@{BIG_MULT}x", lambda: decode_job.audit(
            encode_job.pack_source(spark, big_src),
            decode_job.decode(spark, big_root, packed=True)), reps=2)
        # the scale claim behind salt+Bloom lookups is that the wall is
        # ~INDEPENDENT of table size (metadata filter + ~1 chunk parse):
        # the @Mx wall landing near the 1x wall is the evidence
        timed(f"q_point_lookup@{BIG_MULT}x", lambda: decode_job.decode(
            spark, big_root, doc_id_min=f"doc-{123:012d}",
            doc_id_max=f"doc-{123:012d}").count(), reps=3)
        bagg = (encode_job.read_pages(spark, big_root)
                .agg(F.sum("n_tokens").alias("t")).collect()[0])
        big = {
            "mult": BIG_MULT,
            "n_rows": big_rows,
            "n_tokens": int(bagg.t),
            "encode_tokens_per_sec": round(
                bagg.t / times[f"q_encode@{BIG_MULT}x"], 1),
            "decode_tokens_per_sec": round(
                bagg.t / times[f"q_decode@{BIG_MULT}x"], 1),
        }
        shutil.rmtree(big_root, ignore_errors=True)

        # @Mx PIPELINE walls (VERDICT r4 next #9): dedup/knn/rle are
        # bound by the sf tables, not the token corpus — scale those
        # tables BIG_MULT-x (id-shifted unions, deterministic) into a
        # side sf dir and rerun the same query functions against it.
        big_sf = ("/tmp/tokencodec_bench/"
                  f"{os.path.basename(SF_DIR.rstrip('/'))}_{BIG_MULT}x")

        def scale_table(table: str, idcol: str) -> None:
            dst = os.path.join(big_sf, f"{table}.parquet")
            if os.path.exists(os.path.join(dst, "_SUCCESS")):
                return
            t = spark.read.parquet(os.path.join(SF_DIR, f"{table}.parquet"))
            parts = [t.withColumn(
                idcol, (F.col(idcol).cast("bigint")
                        + F.lit(i * 10 ** 12).cast("bigint")))
                for i in range(BIG_MULT)]
            u = parts[0]
            for p in parts[1:]:
                u = u.unionByName(p)
            u.write.mode("overwrite").parquet(dst)

        scale_table("documents", "doc_id")
        scale_table("embeddings", "vec_id")
        scale_table("lineitem", "l_orderkey")
        for name in ["dedup_minhash", "knn_cosine", "rle_runs_returnflag",
                     "text_fingerprint", "dedup_simhash",
                     "text_decontaminate"]:
            timed(f"q_{name}@{BIG_MULT}x",
                  lambda n=name: q[n](spark, big_sf).count(), reps=2)

    # Scaling evidence: report only the compact headline (the full runs /
    # wall distributions live in BENCH_SCALING.json — embedding the whole
    # file here overflowed the driver's tail capture in round 2).
    scaling = None
    scal_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALING.json")
    if os.path.exists(scal_path):
        with open(scal_path) as f:
            full = json.load(f)
        lc = full.get("large_corpus_4x") or {}
        scaling = {
            "efficiency": full.get("value"),
            "pair_cores": [full.get("n_small"), full.get("n_big")],
            "speedup": full.get("speedup"),
            "passes_0.8_gate": full.get("passes_0.8_gate"),
            "large_corpus_1_to_4": (lc.get("pair_1_to_4") or {}).get(
                "best_overall_efficiency"),
            "large_corpus_2_to_8": (lc.get("pair_2_to_8") or {}).get(
                "warm_min_efficiency"),
            "large_corpus_2_to_8_best": (lc.get("pair_2_to_8") or {}).get(
                "best_overall_efficiency"),
            "details": "BENCH_SCALING.json",
        }

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    # headline total stays round-comparable: base-scale fresh-plan walls
    # only (steady-state twins and @Mx corpus walls are reported in
    # `queries` but would otherwise double-count / shift the metric)
    base_total = sum(v for k, v in times.items()
                     if "_steady" not in k and "@" not in k)
    out = {
        "metric": "bench_total_wall",
        "value": round(base_total, 3),
        "unit": "sec",
        "protocol": "fresh-plan min-of-reps; *_steady = re-exec of built "
                    "plan; @Mx = fresh-plan at M-x corpus (see bench.py "
                    "docstring)",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "n_rows": n_rows,
        "n_tokens": int(agg.t),
        "encode_tokens_per_sec": round(agg.t / times["q_encode"], 1),
        "decode_tokens_per_sec": round(agg.t / times["q_decode"], 1),
        "compression_ratio": round(agg.e / agg.r, 4),
        "enc_bytes": int(agg.e),
        "ref_parquet_bytes": ref_bytes,
        "beats_ref_size": bool(agg.e <= ref_bytes),
        "roundtrip_ok": audit["ok"],
        "n_chunks": int(agg.c),
        "tokens_codec_mix": codec_mix,
        "big_corpus": big,
        "scaling": scaling,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
