"""Per-document and corpus statistics — the engine's A-layer (SURVEY.md §2.4).

* ``doclens``     — analogue of the reference's doclens vector
  (reference src/modelling/checkpoint.jl:102-104; persisted per chunk at
  src/savers.jl:64-68): post-stoplist token count per doc.
* ``corpus_stats``— analogue of setup()'s plan statistics
  (reference src/indexing/collection_indexer.jl:115-139): N, avgdl — except
  computed EXACTLY over the full corpus with a partial+final agg instead of
  the reference's sampled estimate (_sample_embeddings,
  collection_indexer.jl:56-79). Exactness matters: BM25 correctness (and
  rank identity vs the oracle) depends on exact N/avgdl/df — SURVEY.md §7
  hard part (d).

Everything is a Catalyst aggregation — map-side partial aggregation makes
avg/count a single shuffle of one row per partition, which is why this
holds at 10^12 docs unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from colbert_jl_spark.config import EngineConfig
from colbert_jl_spark.functions.tokenizer import doclen_col


def doclens(docs: DataFrame, cfg: EngineConfig = EngineConfig()) -> DataFrame:
    """(doc_id, doclen) — doclen = #post-stoplist tokens, truncated at
    cfg.doc_maxlen. Mirrors reference doclens = sum(attention mask)
    (src/modelling/checkpoint.jl:38)."""
    return docs.select(
        "doc_id",
        doclen_col("text", cfg.doc_maxlen, cfg.stopwords).alias("doclen"),
    )


def corpus_stats(docstats: DataFrame) -> dict:
    """Exact N and avgdl from a doclens frame. Single-row collect of a
    fully-pushed-down aggregate (partial avg per partition → final)."""
    row = docstats.agg(
        F.count("*").alias("n_docs"),
        F.avg("doclen").alias("avgdl"),
        F.sum("doclen").alias("total_tokens"),
    ).first()
    return {
        "n_docs": row["n_docs"],
        "avgdl": float(row["avgdl"]) if row["avgdl"] is not None else 0.0,
        "total_tokens": row["total_tokens"],
    }
