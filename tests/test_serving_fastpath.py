"""Round-7 serving fast-path gates.

Three optimizations changed the search DAG's construction (results must be
bit-identical; these tests pin both the identity and the plan shape):

* functions/smalldf.local_df — tiny driver-side row sets become
  LocalRelations (no ``Scan ExistingRDD``, no job for collect/broadcast).
* wand._attach_query_terms_literal — the broadcast join of the query side
  is compiled as a literal map expression for interactive (≤32-term,
  non-incremental) queries.
* IndexReader.load_hot pins the block cache hash-partitioned by
  ``bucket`` and single-query searches group by bucket alone — the whole
  query DAG is then a single stage with NO Exchange.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from colbert_jl_spark.config import EngineConfig
from colbert_jl_spark.functions.smalldf import local_df
from colbert_jl_spark.operators.bm25 import query_terms
from colbert_jl_spark.operators.codec_blocks import (
    posting_blocks,
    term_postings_with_doclen,
)
from colbert_jl_spark.operators.docstats import corpus_stats, doclens
from colbert_jl_spark.operators.postings import term_df
from colbert_jl_spark.operators.wand import wand_intersect_topk, wand_topk

DOCS = [
    (0, "spark table join merge spark"),
    (1, "window table batch row"),
    (2, "the of and"),  # all stopwords
    (3, "spark spark spark table"),
    (4, "join window merge column key value"),
    (5, "data data table spark join window"),
]
QUERIES = [(0, "spark table join"), (1, "window merge"), (2, "zzzmissing")]


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_local_df_is_local_relation_and_schema_identical(spark):
    rows = [(0, "spark", 1), (1, "table", 2)]
    ddl = "qid long, term string, qtf long"
    fast = local_df(spark, rows, ddl)
    classic = spark.createDataFrame(rows, ddl)
    assert fast.schema == classic.schema
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, classic.collect())
    )
    opt = fast._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in opt and "ExistingRDD" not in opt


def test_local_df_empty_is_empty_local_relation(spark):
    ddl = "qid long, rank int, doc_id long, score double"
    fast = local_df(spark, [], ddl)
    assert fast.schema == spark.createDataFrame([], ddl).schema
    assert fast.collect() == []
    opt = fast._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation <empty>" in opt


@pytest.mark.parametrize("mode", ["topk", "intersect"])
def test_literal_attach_identical_to_broadcast_join(spark, mode):
    cfg = EngineConfig()
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    stats = corpus_stats(doclens(docs, cfg))
    pdl = term_postings_with_doclen(docs, cfg).cache()
    dic = term_df(pdl.select("term", "doc_id", "tf")).cache()
    blocks = posting_blocks(pdl, dic, stats["n_docs"], stats["avgdl"], cfg)
    qdf = spark.createDataFrame(QUERIES, "qid long, query string")
    qt = query_terms(qdf, cfg)
    qt_rows = [
        (int(r.qid), r.term, int(r.qtf)) for r in qt.collect()
    ]
    ex = wand_intersect_topk if mode == "intersect" else wand_topk
    joined = ex(blocks, qt, cfg, stats["avgdl"])
    literal = ex(blocks, None, cfg, stats["avgdl"], qt_literal=qt_rows)
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, literal.collect())
    )
    # single-qid literal call (bucket-only grouping) must also agree
    one = [r for r in qt_rows if r[0] == 0]
    lit1 = ex(blocks, None, cfg, stats["avgdl"], qt_literal=one)
    join1 = ex(
        blocks,
        qt.where(F.col("qid") == 0),
        cfg,
        stats["avgdl"],
    )
    assert sorted(map(tuple, join1.collect())) == sorted(
        map(tuple, lit1.collect())
    )
    pdl.unpersist()
    dic.unpersist()


def test_hot_single_query_plan_has_no_exchange_or_rdd_scan(spark, tmp_path):
    from colbert_jl_spark.plans.build import IndexBuilder, IndexReader

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = str(tmp_path / "idx")
    IndexBuilder(idx, EngineConfig()).build(docs)
    reader = IndexReader(spark, idx)
    reader.load_hot()
    df = reader.search([(0, "spark table join")])
    plan = _executed(df)
    # the single-stage hot path: the only Exchange is INSIDE the cached
    # relation (the one-time pin repartition), never on the per-query path
    per_query_plan = plan.split("InMemoryRelation")[0]
    assert "Exchange" not in per_query_plan
    assert "ExistingRDD" not in plan
    assert "BroadcastExchange" not in plan
    assert "FlatMapGroupsInPandas" in plan
    # identical rows to the cold distributed path on a fresh reader
    cold = IndexReader(spark, idx)
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, cold.search([(0, "spark table join")]).collect())
    )
    # multi-query batched call keeps the group-spreading exchange
    bplan = _executed(reader.search(QUERIES))
    assert "Exchange" in bplan.split("InMemoryRelation")[0]
    reader.release()


def test_queries_df_is_local_relation(spark):
    from colbert_jl_spark.queries import queries_df

    q = queries_df(spark)
    opt = q._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in opt and "ExistingRDD" not in opt
