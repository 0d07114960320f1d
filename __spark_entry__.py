"""Driver contract for the spark-graft builder (PySpark target).

Every entry in ``queries()`` is an operator from SURVEY.md §2 (or a
training-data-pipeline op per the build brief); ``oracle_sql()`` carries
the DuckDB-equivalent SQL for the value-hash correctness gate. The frozen
tokenizer (colbert_jl_spark.config.STOPWORDS + TOKEN_SPLIT_RE) is inlined
into the SQL so both engines tokenize byte-identically.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from colbert_jl_spark.config import STOPWORDS, EngineConfig
from colbert_jl_spark.queries import queries_df, queries_sql_values

CFG = EngineConfig()

# ---------------------------------------------------------------------------
# Shared DuckDB SQL fragments — must stay in lockstep with
# colbert_jl_spark/functions/tokenizer.py (frozen tokenizer contract).
# ---------------------------------------------------------------------------

_STOP_LIST_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# tokens: lowercase → split [^a-z0-9]+ → drop empties → first doc_maxlen →
# drop stopwords  (same order as tokenizer.terms_col)
_DOC_TOK_CTE = f"""
tok AS (
  SELECT doc_id,
         list_filter(
           (list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                        x -> x <> ''))[1:{CFG.doc_maxlen}],
           x -> x NOT IN ({_STOP_LIST_SQL})) AS terms
  FROM documents
),
doc_terms AS (SELECT doc_id, unnest(terms) AS term FROM tok),
docstats AS (SELECT doc_id, CAST(len(terms) AS INTEGER) AS doclen FROM tok),
corpus AS (SELECT count(*) AS n, avg(doclen) AS avgdl FROM docstats),
tf AS (SELECT term, doc_id, count(*) AS tf FROM doc_terms GROUP BY 1, 2),
dict AS (SELECT term, count(*) AS df, sum(tf) AS cf FROM tf GROUP BY 1)
"""

_QUERY_TOK_CTE = f"""
qtok AS (
  SELECT CAST(qid AS BIGINT) AS qid,
         list_filter(
           list_filter(string_split_regex(lower(query), '[^a-z0-9]+'),
                       x -> x <> ''),
           x -> x NOT IN ({_STOP_LIST_SQL})) AS terms
  FROM {queries_sql_values()}
),
qterms AS (SELECT qid, unnest(terms) AS term FROM qtok),
qtf AS (SELECT qid, term, count(*) AS qtf FROM qterms GROUP BY 1, 2)
"""

_BM25_SQL = f"""
WITH {_DOC_TOK_CTE}, {_QUERY_TOK_CTE},
scores AS (
  SELECT q.qid, t.doc_id,
         sum(q.qtf
             * ln(1 + (c.n - d.df + 0.5) / (d.df + 0.5))
             * (t.tf * {CFG.k1 + 1.0})
             / (t.tf + {CFG.k1} * (1 - {CFG.b} + {CFG.b} * ds.doclen / c.avgdl))
         ) AS score
  FROM qtf q
  JOIN dict d USING (term)
  JOIN tf t USING (term)
  JOIN docstats ds ON t.doc_id = ds.doc_id
  CROSS JOIN corpus c
  GROUP BY 1, 2
)
SELECT qid, CAST(rank AS INTEGER) AS rank, doc_id, round(score, 6) AS score
FROM (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid ORDER BY round(score, 6) DESC, doc_id) AS rank
  FROM scores
)
WHERE rank <= {CFG.top_k}
"""


# ---------------------------------------------------------------------------
# Spark-side query callables
# ---------------------------------------------------------------------------

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: exhaustive BM25 top-10 (SURVEY §2.7 Q6/Q7 analogue)."""
    from colbert_jl_spark.operators.bm25 import bm25_topk

    return bm25_topk(_docs(spark, sf_dir), queries_df(spark), CFG, CFG.top_k)


def q_wand_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-max WAND top-10 — must be rank-identical to q_bm25_topk, so it
    shares the same oracle SQL (SURVEY §2.7 Q3-Q7 analogue)."""
    from colbert_jl_spark.operators.wand import wand_topk_inline

    return wand_topk_inline(spark, _docs(spark, sf_dir), queries_df(spark), CFG)


def q_docstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, doclen) — SURVEY §2.3 E2 doclens analogue."""
    from colbert_jl_spark.operators.docstats import doclens

    return doclens(_docs(spark, sf_dir), CFG)


def q_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary (term, df, cf) — SURVEY §2.6 I5 ivf_lengths analogue."""
    from colbert_jl_spark.operators.postings import term_df, term_postings

    return term_df(term_postings(_docs(spark, sf_dir), CFG))


def q_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat posting stream (term, doc_id, tf) — SURVEY §2.6 I5."""
    from colbert_jl_spark.operators.postings import term_postings

    return term_postings(_docs(spark, sf_dir), CFG)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from __spark_entry__ import _extra_queries  # registered below

    base = {
        "bm25_topk": q_bm25_topk,
        "wand_topk": q_wand_topk,
        "docstats": q_docstats,
        "term_df": q_term_df,
        "postings": q_postings,
    }
    base.update(_extra_queries())
    return base


def oracle_sql() -> dict[str, str]:
    base = {
        "bm25_topk": _BM25_SQL,
        # WAND is pruned but rank-identical by construction → same oracle
        "wand_topk": _BM25_SQL,
        "docstats": f"WITH {_DOC_TOK_CTE} SELECT doc_id, doclen FROM docstats",
        "term_df": f"WITH {_DOC_TOK_CTE} SELECT term, df, cf FROM dict",
        "postings": f"WITH {_DOC_TOK_CTE} SELECT term, doc_id, tf FROM tf",
    }
    base.update(_extra_oracles())
    return base


# ---------------------------------------------------------------------------
# Extension registry — further operators append here as they land.
# ---------------------------------------------------------------------------

def _extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {}


def _extra_oracles() -> dict[str, str]:
    return {}
