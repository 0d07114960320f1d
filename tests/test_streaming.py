"""Streaming ingest: file-arrival micro-batches → postings append →
compaction → rank-identical search vs the batch-built index; plus the
watermarked windowed aggregation over events."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from colbert_jl_spark.config import EngineConfig
from colbert_jl_spark.operators.bm25 import bm25_topk
from colbert_jl_spark.plans.build import IndexReader
from colbert_jl_spark.queries import queries_df
from colbert_jl_spark.sources.pages import pages_from_documents
from colbert_jl_spark.streaming.ingest import (
    compact_streamed_index,
    stream_pages_to_postings,
    windowed_event_counts,
)
from tests.conftest import SF001


def test_stream_ingest_compact_search(spark, docs001, tmp_path):
    cfg = EngineConfig(block_size=32)
    pages_dir = str(tmp_path / "pages_in")
    idx = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt")

    # simulate arrival in 3 waves (3 parquet files → ≥1 micro-batches)
    pages = pages_from_documents(docs001)
    for i in range(3):
        wave = pages.where(F.crc32(F.col("url")) % 3 == i)
        wave.write.mode("append").parquet(pages_dir)

    stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg)
    log = spark.read.parquet(os.path.join(idx, "ingest_log"))
    assert log.agg(F.sum("n_docs")).first()[0] == docs001.count()

    plan = compact_streamed_index(spark, idx, cfg)
    assert plan["n_docs"] == docs001.count()

    reader = IndexReader(spark, idx)
    assert reader.validate()["ok"]
    got = (
        reader.search(queries_df(spark))
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    want = (
        bm25_topk(docs001, queries_df(spark), cfg)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_stream_resume_is_idempotent(spark, docs001, tmp_path):
    """Re-running the stream over the same checkpoint ingests nothing new
    (exactly-once at batch granularity)."""
    cfg = EngineConfig(block_size=32)
    pages_dir = str(tmp_path / "pages_in")
    idx = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt")
    pages_from_documents(docs001).write.parquet(pages_dir)

    stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg)
    n1 = spark.read.parquet(os.path.join(idx, "postings")).count()
    stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg)  # replay
    n2 = spark.read.parquet(os.path.join(idx, "postings")).count()
    assert n1 == n2


def test_windowed_event_counts(spark, tmp_path):
    """availableNow run over the events table as a file stream; result
    must equal the equivalent batch windowed aggregation."""
    events_dir = str(tmp_path / "events_in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt_ev")
    batch = spark.read.parquet(f"{SF001}/events.parquet")
    batch.write.parquet(events_dir)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream = spark.readStream.schema(schema).parquet(events_dir)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir).toPandas()
    # append mode only emits windows the final watermark has passed:
    # window_end <= max(ts) - 10 min. Later windows are correctly withheld
    # (they could still receive late data in a live stream).
    max_ts = batch.agg(F.max("ts")).first()[0]
    want = (
        batch.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "sum_value",
        )
        .where(F.col("window_end") <= F.lit(max_ts) - F.expr("INTERVAL 10 MINUTES"))
        .toPandas()
    )
    assert len(got) > 0
    key = ["window_start", "window_end", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)[want.columns]
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_like=True)
