"""Structured Streaming encode: incremental ingestion of token batches.

The reference exposes an incremental conduit source (`sourceParquet`,
/root/reference/src/Parquet/Reader.hs:282-290) — "streaming" there
means incremental IO, not event time. Our Spark-native analog: a
`readStream` file source over the token table directory, encoded
micro-batch by micro-batch via ``foreachBatch`` into the same snapshot
table, one commit group per micro-batch (so the stream inherits the
engine's resume/lineage semantics). `Trigger.AvailableNow` gives
batch-incremental catch-up runs — new source files since the last
checkpoint are encoded and committed, then the query stops.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from tokencodec.spark import partition as part
from tokencodec.spark.encode_job import (META_DDL, PAGES_DDL, _COLS,
                                         _sweep_orphans,
                                         direct_write_supported,
                                         make_direct_writer, make_encoder,
                                         next_chain_max,
                                         next_extra_schema_chain,
                                         next_table_totals)
from tokencodec.spark.synth import SCHEMA_DDL
from tokencodec.spark.table import SnapshotTable


def encode_stream(spark: SparkSession, source_dir: str, out_root: str,
                  checkpoint_dir: str | None = None,
                  max_chunk_tokens: int = part.MAX_CHUNK_TOKENS) -> None:
    """Encode all new files in ``source_dir`` (parquet, input_hint
    schema) into ``out_root``, one snapshot commit per micro-batch.
    Runs with availableNow and blocks until caught up.

    Core-schema only by contract: the stream reads exactly
    (doc_id, tokens, n_tok, source) — schema-evolution extra columns
    in the source files are not ingested on this path (batch
    ``encode`` handles them); the fixed readStream schema makes that
    explicit rather than silent."""
    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(out_root, "_stream_checkpoint")
    tbl = SnapshotTable(out_root)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        key = f"stream-batch-{batch_id}"
        if key in tbl.committed_groups():
            return  # replayed micro-batch after restart: already committed
        # per-batch uid prefix: each micro-batch is its own commit group
        # and restarts chunk_seq per (bucket, salt), so appended batches
        # would otherwise repeat chunk uids
        bucketed = part.bucketed(batch_df, n_salts=part.salts_for(batch_df.count()))
        if direct_write_supported(out_root):
            # direct task-side write (same path as batch encode's fast
            # default): pages parquet written by pyarrow inside the
            # task, file list committed from the collected summary rows,
            # orphaned attempt files swept; max_doc_parts mirrors batch
            # encode so decode() plans job-free
            run_dir = tbl.new_run_dir()
            tbl.fs.mkdirs(run_dir)
            writer_fn = make_direct_writer(run_dir, "zstd", max_chunk_tokens,
                                           commit_groups=1, uid_prefix=key)
            meta = (bucketed.select(_COLS)
                    .mapInArrow(writer_fn, META_DDL).collect())
            _sweep_orphans(tbl.fs, run_dir,
                           {r["file"].rsplit("/", 1)[-1] for r in meta})
            if not meta:
                # zero-row micro-batch: nothing was written — drop the
                # run dir instead of stranding it unreferenced forever
                tbl.fs.delete(run_dir, recursive=True)
            m = {"n_chunks": sum(r["n_chunks"] for r in meta),
                 "n_rows": sum(r["n_rows"] for r in meta),
                 "n_tokens": sum(r["n_tokens"] for r in meta),
                 "raw_bytes": sum(r["raw_bytes"] for r in meta),
                 "enc_bytes": sum(r["enc_bytes"] for r in meta),
                 "max_doc_parts": max((r["max_doc_parts"] for r in meta),
                                      default=0),
                 "batch_id": batch_id}
            parent = tbl.current_snapshot()
            totals = next_table_totals(parent, m)
            if totals is not None:
                m["table_totals"] = totals
            cmax = next_chain_max(parent, m["max_doc_parts"])
            if cmax is not None:
                m["max_doc_parts_chain"] = cmax
            # the stream ingests no extras, but a commit that DROPS the
            # cumulative extra-column chain would force every later
            # reader back onto the chain-walk fallback (and lose the
            # declarations once the declaring commits expire)
            esc = next_extra_schema_chain(parent, {})
            if esc is not None:
                m["extra_schema_chain"] = esc
            tbl.commit({key: sorted(r["file"] for r in meta)}, metrics=m)
            return
        # Hadoop-only scheme the pyarrow workers can't address: classic
        # JVM write, run-dir commit
        from pyspark.sql import Observation
        from pyspark.sql import functions as F
        encoder = make_encoder(max_chunk_tokens, uid_prefix=key)
        pages = bucketed.select(_COLS).mapInArrow(encoder, PAGES_DDL)
        obs = Observation()
        observed = pages.observe(
            obs, F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("enc_bytes").alias("enc_bytes"),
            F.max("doc_parts").alias("max_doc_parts"))
        run_dir = tbl.new_run_dir()
        observed.write.mode("overwrite").parquet(run_dir)
        m = {k: int(v or 0) for k, v in obs.get.items()}
        m["batch_id"] = batch_id
        parent = tbl.current_snapshot()
        totals = next_table_totals(parent, m)
        if totals is not None:
            m["table_totals"] = totals
        cmax = next_chain_max(parent, m["max_doc_parts"])
        if cmax is not None:
            m["max_doc_parts_chain"] = cmax
        esc = next_extra_schema_chain(parent, {})
        if esc is not None:
            m["extra_schema_chain"] = esc
        tbl.commit({key: [run_dir]}, metrics=m)

    stream = (spark.readStream.schema(SCHEMA_DDL).parquet(source_dir)
              .writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir)
              .trigger(availableNow=True)
              .start())
    stream.awaitTermination()


def dedup_stream(spark: SparkSession, source_dir: str, out_dir: str,
                 checkpoint_dir: str | None = None,
                 ttl_ms: int | None = None) -> None:
    """Stateful cross-batch exact dedup: emit only the FIRST occurrence
    of each doc_id ever seen by the stream, remembering seen keys in
    per-group state (`applyInPandasWithState`) that survives restarts
    via the checkpoint — the custom-stateful-operator pattern for
    incremental training-data ingestion (a doc re-appearing in a later
    crawl drop is suppressed without re-reading history). State is
    partitioned by doc_id, so it shards across executors.

    ``ttl_ms=None`` (default): no timeout — dedup state is permanent by
    design. With a TTL, keys idle for ``ttl_ms`` of processing time are
    garbage-collected (`ProcessingTimeTimeout`), bounding total state
    for unbounded key spaces: a doc re-appearing AFTER its state
    expired is re-admitted (the dedup window is a sliding TTL since the
    key's last sighting — every sighting, emitted or suppressed,
    re-arms the clock). Expiry fires at the next micro-batch boundary
    after the deadline, Spark's contract for processing-time timeouts."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(out_dir, "_dedup_checkpoint")

    def first_only(key, pdfs, state):
        if ttl_ms is not None and state.hasTimedOut:
            # idle past the TTL: drop the key so a future sighting
            # re-admits (invoked with an empty iterator, nothing to emit)
            state.remove()
            return
        if not state.exists:
            for pdf in pdfs:
                if len(pdf):
                    state.update((True,))
                    if ttl_ms is not None:
                        state.setTimeoutDuration(ttl_ms)
                    yield pd.DataFrame({"doc_id": [pdf["doc_id"].iloc[0]],
                                        "n_tok": [pdf["n_tok"].iloc[0]],
                                        "source": [pdf["source"].iloc[0]]})
                    break
        elif ttl_ms is not None:
            # suppressed duplicate: re-arm the GC clock (sliding TTL)
            state.setTimeoutDuration(ttl_ms)

    src = (spark.readStream.schema(SCHEMA_DDL).parquet(source_dir)
           .select("doc_id", "n_tok", "source"))
    out = src.groupBy("doc_id").applyInPandasWithState(
        first_only, "doc_id string, n_tok int, source string",
        "seen boolean", "append",
        GroupStateTimeout.NoTimeout if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout)
    q = (out.writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    if ttl_ms is None:
        q.awaitTermination()
        return
    # With processing-time timeouts every completed batch schedules a
    # successor (FlatMapGroupsWithStateExec.shouldRunAnotherBatch is
    # true whenever the clock advanced), so an availableNow query never
    # self-terminates. Drain the available data, let a couple of idle
    # batches fire any DUE timers, then stop: not-yet-due timers stay in
    # the checkpointed state and fire on a later run — the documented
    # "next micro-batch after the deadline" contract.
    import time as _time
    deadline = _time.time() + 600
    idle_batches: set[int] = set()
    while q.isActive and _time.time() < deadline:
        p = q.lastProgress
        if p and p["numInputRows"] == 0:
            idle_batches.add(p["batchId"])
            if len(idle_batches) >= 2:
                break
        _time.sleep(0.2)
    q.stop()
    q.awaitTermination()
