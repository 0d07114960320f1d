"""Structured Streaming ingest: continuous page arrival → incremental index.

The reference is strictly batch (SURVEY.md §2.10: no streaming operators;
index updates listed as future work at reference README.md:179-190). This
module is the Spark-native extension the north rule's Iceberg pipeline
implies: pages land continuously, postings append per micro-batch, and a
periodic compaction rebuilds the queryable block index.

* ``stream_pages_to_postings`` — ``readStream`` over a pages directory →
  extract/tokenize (same frozen UDF/expressions as the batch path) →
  ``foreachBatch`` appends `(term, doc_id, tf, doclen)` postings plus an
  ingest-log row (batch_id, docs, postings) — the streaming continuation
  of the build's per-partition lineage.
* ``compact_streamed_index`` — runs the batch builder's downstream stages
  (plan/dictionary/blocks/lineage) over the accumulated postings; doc
  count comes from the ingest log. After compaction the index is served
  by the same IndexReader/WAND path as a batch-built index.
* ``windowed_event_counts`` — watermarked sliding-window aggregation over
  the events table (ts, event_type, value): the late-data-tolerant
  streaming agg pattern (10-minute watermark, 5-minute tumbling windows).

foreachBatch (not a streaming sink) is deliberate: posting construction is
a batch transformation per micro-batch, and idempotency comes from the
checkpointed batch_id (re-delivered batches overwrite their own
subdirectory — exactly-once at directory granularity; Iceberg's
transactional append replaces the directory trick in production).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from colbert_jl_spark.config import EngineConfig

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_pages_to_postings(
    spark: SparkSession,
    pages_dir: str,
    index_path: str,
    checkpoint_dir: str,
    cfg: EngineConfig = EngineConfig(),
    available_now: bool = True,
):
    """Start (and with available_now=True, run to completion) the ingest
    stream. Returns the StreamingQuery."""
    from colbert_jl_spark.operators.codec_blocks import term_postings_with_doclen
    from colbert_jl_spark.sources.pages import docs_from_pages

    os.makedirs(os.path.join(index_path, "postings"), exist_ok=True)
    os.makedirs(os.path.join(index_path, "ingest_log"), exist_ok=True)

    pages = (
        spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        docs = docs_from_pages(batch_df)
        n_docs = docs.count()
        if n_docs == 0:
            return
        postings = term_postings_with_doclen(docs, cfg)
        # idempotent append: each micro-batch owns its subdirectory, so a
        # checkpoint-replayed batch overwrites itself instead of doubling
        out = os.path.join(index_path, "postings", f"batch={batch_id}")
        postings.write.mode("overwrite").parquet(out)
        n_postings = batch_df.sparkSession.read.parquet(out).count()
        log_dir = os.path.join(index_path, "ingest_log", f"batch={batch_id}")
        batch_df.sparkSession.createDataFrame(
            [(batch_id, n_docs, n_postings)],
            "batch_id long, n_docs long, n_postings long",
        ).write.mode("overwrite").parquet(log_dir)

    writer = (
        pages.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()


def compact_streamed_index(
    spark: SparkSession, index_path: str, cfg: EngineConfig = EngineConfig()
) -> dict:
    """Rebuild plan/dictionary/blocks/lineage over all streamed postings —
    the incremental-merge job a scheduler runs periodically. Clears the
    downstream stage marks so the builder re-derives them; the postings
    stage is the streamed data itself."""
    from colbert_jl_spark.plans.build import IndexBuilder, _load_stages, _mark_stage

    ingest = spark.read.parquet(os.path.join(index_path, "ingest_log"))
    n_docs = ingest.agg(F.sum("n_docs")).first()[0] or 0

    # stage ledger: postings exist (streamed); downstream must rebuild
    stage_file = os.path.join(index_path, "_STAGES.json")
    stages = _load_stages(index_path)
    for s in ("plan", "dictionary", "blocks", "lineage"):
        stages.pop(s, None)
    with open(stage_file, "w") as f:
        json.dump(stages, f)
    _mark_stage(index_path, "postings", {"streamed": True})

    builder = IndexBuilder(index_path, cfg)
    return builder.finish_from_postings(spark, n_docs_total=int(n_docs))


def windowed_event_counts(
    events_stream: DataFrame,
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type — the standard
    late-data-tolerant streaming aggregation. Input must be a streaming
    DataFrame with (ts timestamp, event_type string, value double)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
