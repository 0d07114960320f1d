"""Source loaders over the driver-generated parquet tables (TESTDATA.md).

Analogue of the reference's collection load S1 (reference
src/indexing.jl:28-29 ``readlines``) — except the collection is a
DataFrame scan, so Catalyst gets column pruning + predicate pushdown at the
parquet reader for free. On a production cluster the same call targets an
Iceberg table (``spark.read.format("iceberg")``); the engine's operators
never care which.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def sf_dir_from_env() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or sf_dir_from_env()
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_documents(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """The document collection: (doc_id, text, lang, source, n_chars)."""
    return load_table(spark, "documents", sf_dir)


def load_embeddings(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """The embedding table: (vec_id, embedding: array<float>, label)."""
    return load_table(spark, "embeddings", sf_dir)
