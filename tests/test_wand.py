"""WAND ≡ exhaustive-oracle rank identity — the engine's hardest gate
(SURVEY.md §7 hard part (a)); analogue of the reference pinning its
end-to-end top-k outputs (reference README.md:153-156 golden result)."""

from __future__ import annotations

import pandas as pd
import pytest

from colbert_jl_spark.config import EngineConfig
from colbert_jl_spark.operators.bm25 import bm25_topk
from colbert_jl_spark.operators.wand import wand_topk_inline
from colbert_jl_spark.queries import queries_df
from tests.conftest import SF01


def _assert_rank_identical(oracle_pdf: pd.DataFrame, wand_pdf: pd.DataFrame):
    o = oracle_pdf.sort_values(["qid", "rank"]).reset_index(drop=True)
    w = wand_pdf.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert len(o) == len(w), f"row counts differ: oracle={len(o)} wand={len(w)}"
    pd.testing.assert_frame_equal(o, w, check_like=True)


def test_wand_rank_identical_sf001(spark, docs01):
    cfg = EngineConfig()
    q = queries_df(spark)
    oracle = bm25_topk(docs01, q, cfg).toPandas()
    wand = wand_topk_inline(spark, docs01, q, cfg).toPandas()
    _assert_rank_identical(oracle, wand)


@pytest.mark.parametrize("fmt", ["columnar", "varint", "packed"])
def test_wand_rank_identical_small_blocks(spark, docs01, fmt):
    """Tiny blocks force many skip/pivot decisions (stress the BMW logic);
    small salt count stresses the bucket merge; both block formats must be
    served identically by the executor."""
    cfg = EngineConfig(
        block_size=8, num_index_partitions=7, min_bucket_docs=1, block_format=fmt
    )
    q = queries_df(spark)
    oracle = bm25_topk(docs01, q, cfg).toPandas()
    wand = wand_topk_inline(spark, docs01, q, cfg).toPandas()
    _assert_rank_identical(oracle, wand)


def test_wand_duplicate_query_terms(spark, docs01):
    """qtf > 1: a repeated query term multiplies its contribution in both
    the oracle and WAND (reference analogue: repeated query tokens each
    contribute a MaxSim row). Also pins score relation: score('data data')
    = 2 x score('data') per doc."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("qid", LongType()), StructField("query", StringType())]
    )
    q = spark.createDataFrame(
        [(0, "data"), (1, "data data"), (2, "data data table")], schema
    )
    cfg = EngineConfig()
    oracle = bm25_topk(docs01, q, cfg).toPandas()
    wand = wand_topk_inline(spark, docs01, q, cfg).toPandas()
    _assert_rank_identical(oracle, wand)
    s1 = oracle[oracle.qid == 0].set_index("doc_id").score
    s2 = oracle[oracle.qid == 1].set_index("doc_id").score
    shared = s1.index.intersection(s2.index)
    assert len(shared) >= 5
    assert ((s2[shared] - 2 * s1[shared]).abs() < 2e-6).all()


@pytest.mark.parametrize("fmt", ["varint", "packed", "columnar"])
def test_intersect_rank_identical(spark, docs01, fmt):
    """Skip-pointer zig-zag intersection == exhaustive conjunctive scorer,
    across all block formats and with tiny blocks (many skip decisions)."""
    from colbert_jl_spark.operators.bm25 import bm25_topk_conjunctive
    from colbert_jl_spark.operators.wand import wand_intersect_inline

    cfg = EngineConfig(
        block_size=8, num_index_partitions=7, min_bucket_docs=1, block_format=fmt
    )
    q = queries_df(spark)
    oracle = bm25_topk_conjunctive(docs01, q, cfg).toPandas()
    zig = wand_intersect_inline(spark, docs01, q, cfg).toPandas()
    _assert_rank_identical(oracle, zig)
    assert len(oracle) > 0  # the fixture queries intersect non-trivially


def test_intersect_zero_df_term_empties_query(spark, docs01):
    """Conjunctive semantics: one impossible term empties the whole query
    — in the block executor that falls out of the n_terms guard (the term
    has no blocks anywhere, so every bucket sees fewer cursors than
    n_terms)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from colbert_jl_spark.operators.bm25 import bm25_topk_conjunctive
    from colbert_jl_spark.operators.wand import wand_intersect_inline

    schema = StructType(
        [StructField("qid", LongType()), StructField("query", StringType())]
    )
    q = spark.createDataFrame(
        [(0, "data zzzmissingterm"), (1, "data table")], schema
    )
    cfg = EngineConfig(block_size=16, min_bucket_docs=100)
    oracle = bm25_topk_conjunctive(docs01, q, cfg).toPandas()
    zig = wand_intersect_inline(spark, docs01, q, cfg).toPandas()
    _assert_rank_identical(oracle, zig)
    assert 0 not in set(zig.qid)  # impossible term → empty
    assert 1 in set(zig.qid)


def test_wand_on_synthetic_needles(spark):
    """Synthetic Zipf corpus with needle markers: the needle query's top hit
    must be its host doc (exact-hit fixture, FIXTURES.md §2)."""
    from colbert_jl_spark.sources.pages import docs_from_pages, synth_pages
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    pages = synth_pages(spark, 300, seed=42)
    docs = docs_from_pages(pages).cache()
    # find one needle term in the corpus
    needle_doc = (
        docs.selectExpr("doc_id", "text")
        .where("text like '%needle%'")
        .first()
    )
    needle_term = [t for t in needle_doc.text.split() if t.startswith("needle")][0]
    schema = StructType(
        [StructField("qid", LongType()), StructField("query", StringType())]
    )
    q = spark.createDataFrame([(0, needle_term), (1, "w0 w1 w2")], schema)
    cfg = EngineConfig(block_size=16, min_bucket_docs=50)
    oracle = bm25_topk(docs, q, cfg).toPandas()
    wand = wand_topk_inline(spark, docs, q, cfg).toPandas()
    _assert_rank_identical(oracle, wand)
    top_needle = wand[(wand.qid == 0) & (wand["rank"] == 1)]
    assert top_needle.doc_id.iloc[0] == needle_doc.doc_id
