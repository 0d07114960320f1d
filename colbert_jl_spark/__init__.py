"""colbert_jl_spark — a from-scratch PySpark-native full-text retrieval engine.

Re-expresses the query/data-processing capabilities of JuliaGenAI/ColBERT.jl
(reference at /root/reference, see SURVEY.md) as an idiomatic Spark pipeline:

* offline inverted-index build (SPIMI posting construction + salted merge +
  delta/varint-compressed posting blocks with block-max metadata) — the
  analogue of the reference's ``index(indexer)`` build driver
  (reference src/indexing.jl:63-147), and
* query-time BM25 top-k via block-max WAND — the analogue of the
  reference's ``search(searcher, query, k)`` (reference src/searching.jl:93-128),
  rank-identical to an exhaustive pure-DataFrame oracle.

Plus the training-data-pipeline operators a 100 TB corpus needs: dedup
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(language-ID, quality scoring, token counting, fingerprinting).

All bulk state lives in DataFrames; Python appears only inside vectorized
Arrow/pandas UDFs (never per-row).
"""

__version__ = "0.1.0"

from colbert_jl_spark.config import EngineConfig

__all__ = ["EngineConfig", "__version__"]
