"""Driver contract for the spark-graft builder (PySpark target).

Every entry in ``queries()`` is an operator from SURVEY.md §2 (or a
training-data-pipeline op per the build brief); ``oracle_sql()`` carries
the DuckDB-equivalent SQL for the value-hash correctness gate. The frozen
tokenizer (colbert_jl_spark.config.STOPWORDS + TOKEN_SPLIT_RE) is inlined
into the SQL so both engines tokenize byte-identically.
"""

from __future__ import annotations

import os
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
dict AS (SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1)
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

_BM25_CONJ_SQL = f"""
WITH {_DOC_TOK_CTE}, {_QUERY_TOK_CTE},
qn AS (SELECT qid, count(*) AS n_terms FROM qtf GROUP BY 1),
scores AS (
  SELECT q.qid, t.doc_id,
         sum(q.qtf
             * ln(1 + (c.n - d.df + 0.5) / (d.df + 0.5))
             * (t.tf * {CFG.k1 + 1.0})
             / (t.tf + {CFG.k1} * (1 - {CFG.b} + {CFG.b} * ds.doclen / c.avgdl))
         ) AS score,
         count(*) AS hit
  FROM qtf q
  JOIN dict d USING (term)
  JOIN tf t USING (term)
  JOIN docstats ds ON t.doc_id = ds.doc_id
  CROSS JOIN corpus c
  GROUP BY 1, 2
)
SELECT qid, CAST(rank AS INTEGER) AS rank, doc_id, round(score, 6) AS score
FROM (
  SELECT s.qid, s.doc_id, s.score,
         row_number() OVER (PARTITION BY s.qid
                            ORDER BY round(s.score, 6) DESC, s.doc_id) AS rank
  FROM scores s JOIN qn USING (qid)
  WHERE s.hit = qn.n_terms
)
WHERE rank <= {CFG.top_k}
"""


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


def q_bm25_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (posting-list intersection) BM25 top-10 — exhaustive
    referee (north rule: 'posting-list intersection')."""
    from colbert_jl_spark.operators.bm25 import bm25_topk_conjunctive

    return bm25_topk_conjunctive(_docs(spark, sf_dir), queries_df(spark), CFG, CFG.top_k)


def q_wand_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-pointer zig-zag intersection over the block index — must be
    rank-identical to q_bm25_conjunctive, so it shares the oracle."""
    from colbert_jl_spark.operators.wand import wand_intersect_inline

    return wand_intersect_inline(spark, _docs(spark, sf_dir), queries_df(spark), CFG)


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
        "bm25_conjunctive": q_bm25_conjunctive,
        "wand_intersect": q_wand_intersect,
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
        "bm25_conjunctive": _BM25_CONJ_SQL,
        # the zig-zag intersect executor must be rank-identical too
        "wand_intersect": _BM25_CONJ_SQL,
        "docstats": f"WITH {_DOC_TOK_CTE} SELECT doc_id, doclen FROM docstats",
        "term_df": f"WITH {_DOC_TOK_CTE} SELECT term, df, cf FROM dict",
        "postings": f"WITH {_DOC_TOK_CTE} SELECT term, doc_id, tf FROM tf",
    }
    base.update(_extra_oracles())
    return base


# ---------------------------------------------------------------------------
# Training-data pipeline operators: dedup / similarity / text analysis
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from colbert_jl_spark.operators.dedup import exact_duplicates

    return exact_duplicates(_docs(spark, sf_dir))


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from colbert_jl_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.5, cfg=CFG)


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs at threshold 0.8. Banding (16x4) has
    ~certain recall at jaccard >= 0.8, so the EXACT-jaccard SQL is a valid
    oracle — any miss is a real bug, not LSH variance."""
    from colbert_jl_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(spark, sf_dir), n=3, threshold=0.8, cfg=CFG)


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wave-vs-corpus INCREMENTAL dedup (streaming/dedup_state.DedupIndex):
    the documents table is streamed in two waves (split on doc_id
    parity); each wave computes MinHash signatures for its own docs only
    and joins its bands against the persisted, bucket-pruned band table.
    The final labels must equal a from-scratch dedup_clusters run — so
    this row shares dedup_clusters' RECURSIVE-CTE reachability oracle.
    The result is localCheckpoint-pinned so the temp state dir can be
    removed before the driver collects."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from colbert_jl_spark.streaming.dedup_state import DedupIndex

    docs = _docs(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="dedup_state_")
    try:
        idx = DedupIndex(tmp, n=3, threshold=0.8, cfg=CFG)
        w1 = docs.where(F.col("doc_id") % 2 == 0)
        w2 = docs.where(F.col("doc_id") % 2 == 1)
        idx.update(spark, w1, None)
        idx.update(spark, w2, w1)
        return idx.labels(spark).localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup CLUSTERS: connected components over the
    MinHash-LSH pair graph at threshold 0.8 (operators/dedup.
    dedup_clusters — alternating large-star/small-star contraction,
    Kiveris et al. 2014, O(log n) all-Catalyst rounds), one
    row per document, component_id = min doc_id reachable; the keep
    filter is doc_id == component_id. Oracled by a DuckDB RECURSIVE CTE
    reachability walk over the same exact-Jaccard edge set."""
    from colbert_jl_spark.operators.dedup import dedup_clusters

    return dedup_clusters(_docs(spark, sf_dir), n=3, threshold=0.8, cfg=CFG)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-pairs (Hamming <= 3). DuckDB lacks xxhash64, so the
    oracle materializes term->hash from the bit-verified Python clone
    (functions/hashing.py) as a VALUES table and recomputes the simhash
    exactly — a full value-hash gate."""
    from colbert_jl_spark.operators.dedup import simhash_near_pairs

    return simhash_near_pairs(_docs(spark, sf_dir), max_hamming=3, cfg=CFG)


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _query_vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    return (
        _embeddings(spark, sf_dir)
        .where(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("qvec_id"), F.col("embedding").alias("qembedding"))
    )


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from colbert_jl_spark.operators.similarity import cosine_topk

    return cosine_topk(_embeddings(spark, sf_dir), _query_vecs(spark, sf_dir), k=5)


def q_ann_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k. The seeded hyperplanes are inlined
    into the DuckDB oracle below, which replicates candidate generation
    bit-for-bit — so this is a full value-hash gate, plus a recall bound
    vs brute force in tests/test_similarity.py."""
    from colbert_jl_spark.operators.similarity import lsh_ann_topk

    return lsh_ann_topk(
        _embeddings(spark, sf_dir),
        _query_vecs(spark, sf_dir),
        k=5,
        dim=_EMB_DIM,
        n_planes=_ANN_PLANES,
        n_tables=_ANN_TABLES,
    )


# LSH operating points for the two graded approximate-similarity queries.
# 4 planes x 16 tables: collision prob 1-(1-(1-theta/pi)^4)^16 ~ 0.94 at
# cosine 0.4 (the fixtures' near-dup regime; max pairwise cosine in the
# synthetic embeddings is ~0.51). The DuckDB oracles below REPLICATE the
# LSH candidate generation exactly (hyperplanes inlined as literals), so
# these rows are full value-hash gates — recall vs brute force is a
# separate measured bound in tests/test_similarity.py.
_EMB_DIM = 64
_ANN_PLANES, _ANN_TABLES = 4, 16
_NEARDUP_PLANES, _NEARDUP_TABLES = 4, 16


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed near-dup pairs — the 100 TB path (the O(N^2)
    brute_force_neardup_pairs variant is the pytest oracle only; the graded
    plan must contain no CartesianProduct, asserted in test_plans)."""
    from colbert_jl_spark.operators.similarity import embedding_neardup_pairs

    return embedding_neardup_pairs(
        _embeddings(spark, sf_dir),
        threshold=0.4,
        dim=_EMB_DIM,
        n_planes=_NEARDUP_PLANES,
        n_tables=_NEARDUP_TABLES,
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from colbert_jl_spark.functions.text_quality import lang_id_col

    return _docs(spark, sf_dir).select(
        "doc_id", lang_id_col("text", CFG.doc_maxlen).alias("lang_pred")
    )


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from colbert_jl_spark.functions.text_quality import quality_score_col, token_counts

    d = _docs(spark, sf_dir)
    counts = token_counts("text", CFG.doc_maxlen)
    return d.select(
        "doc_id",
        counts["n_tokens"].alias("n_tokens"),
        counts["n_ws_tokens"].alias("n_ws_tokens"),
        counts["n_chars"].alias("n_chars"),
        quality_score_col("text", CFG.doc_maxlen).alias("quality"),
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from colbert_jl_spark.functions.text_quality import fingerprint_col

    return _docs(spark, sf_dir).select(
        "doc_id", fingerprint_col("text", CFG.doc_maxlen).alias("fingerprint")
    )


# ---------------------------------------------------------------------------
# Relational coverage demos (SURVEY §2.8 shapes: agg, join, top-k)
# ---------------------------------------------------------------------------

def q_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The input_hint per-row invariant as a driver-checked query: wrap
    documents into the pages shape (html = fixed template around text) and
    run the vectorized extract UDF; the oracle simply returns (url, text),
    so ANY byte deviation in extraction hash-mismatches."""
    from colbert_jl_spark.functions.tokenizer import extract_text
    from colbert_jl_spark.sources.pages import pages_from_documents

    pages = pages_from_documents(_docs(spark, sf_dir))
    return pages.select("url", extract_text("html").alias("text"))


def q_posting_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-salt posting runs — the UNBOUNDED posting-list surface (the
    skew-safe stage-1 output of the salted merge, VERDICT r2 item 4).
    Flattened with posexplode so the gate value-hashes the in-run ORDER."""
    from pyspark.sql import functions as F

    from colbert_jl_spark.operators.postings import posting_runs, term_postings

    runs = posting_runs(term_postings(_docs(spark, sf_dir), CFG), CFG)
    return runs.select(
        "term", "salt", "sub_df", F.posexplode("sub_run").alias("pos", "p")
    ).select(
        "term", "salt", "sub_df", F.col("pos").cast("int").alias("pos"),
        F.col("p.doc_id").alias("doc_id"), F.col("p.tf").alias("tf"),
    )


def q_relevance_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic conjunctive-containment relevance labels — the ground
    truth of the hits@k retrieval-quality harness (eval.py; reference
    examples/AIHelpMe/evals.jl:33-42 analogue)."""
    from colbert_jl_spark.eval import relevance_labels

    return relevance_labels(_docs(spark, sf_dir), queries_df(spark), CFG)


# Fixed phrase set for the positional-matching row: hits (incl. a repeated-
# term phrase), a stopword-bearing phrase (raw-token semantics keep its
# position slots), and an absent phrase (empty-result edge).
PHRASE_SET: list[tuple[int, str]] = [
    (0, "fast table"),
    (1, "table table"),
    (2, "value fast"),
    (3, "the a"),
    (4, "zzzmissing phrase"),
]


def q_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase matching (consecutive raw tokens) — served from
    the PERSISTED positional index (VERDICT r3 item 1): the build writes a
    term_bucket-partitioned (term, doc_id, positions) stage and
    IndexReader.phrase() prunes the scan to the phrase's terms, replacing
    the round-3 inline shape that re-tokenized the corpus per call
    (operators/phrase.py; plan-gated in tests/test_phrase.py).

    The index lives at a temp path keyed on (sf_dir, config, PID) and
    builds with force=False, so repeated driver invocations IN THIS
    PROCESS resume/skip completed stages instead of paying a fresh corpus
    build each call; the pid component keeps concurrent processes (and
    any stale dir a killed run left behind, or regenerated testdata at
    the same path) from sharing state, and the dir is removed at
    interpreter exit."""
    import atexit
    import hashlib
    import shutil
    import tempfile

    from colbert_jl_spark.plans.build import IndexBuilder, IndexReader

    docs = _docs(spark, sf_dir)
    tag = hashlib.sha256(f"{sf_dir}|{CFG.to_json()}".encode()).hexdigest()[:12]
    idx = os.path.join(
        tempfile.gettempdir(), f"colbert_phrase_idx_{tag}_{os.getpid()}"
    )
    builder = IndexBuilder(idx, CFG)
    builder.build(docs)
    builder.build_positions(docs)
    atexit.register(shutil.rmtree, idx, ignore_errors=True)
    return IndexReader(spark, idx).phrase(PHRASE_SET)


def q_doc_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSR prefix-sum offsets (SURVEY §2.6 I4 analogue — window agg)."""
    from colbert_jl_spark.operators.docstats import doclens
    from colbert_jl_spark.operators.stats import doc_offsets

    return doc_offsets(doclens(_docs(spark, sf_dir), CFG))


def q_doclen_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact bucket cutoffs/weights (SURVEY §2.4 A5 analogue)."""
    from pyspark.sql import functions as F

    from colbert_jl_spark.operators.docstats import doclens
    from colbert_jl_spark.operators.stats import doclen_quantiles

    q = doclen_quantiles(doclens(_docs(spark, sf_dir), CFG), nbits=2)
    return q.select("kind", "idx", F.round("prob", 6).alias("prob"),
                    F.round("value", 6).alias("value"))


def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_join_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        rev.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("rank", "c_custkey", "c_name", "revenue")
    )


# ---------------------------------------------------------------------------
# Oracle SQL for the extension operators
# ---------------------------------------------------------------------------

from colbert_jl_spark.functions.text_quality import LANG_MARKERS  # noqa: E402

_RAW_TOK_CTE = f"""
rawtok AS (
  SELECT doc_id,
         (list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                      x -> x <> ''))[1:{CFG.doc_maxlen}] AS toks
  FROM documents
)
"""

def _shingle_jaccard_cte(max_shingle_df: int | None) -> str:
    """Exact n-gram Jaccard CTE chain. ``max_shingle_df`` mirrors the
    engine's head-shingle cap (dedup.ngram_jaccard_pairs); None = uncapped
    TRUE Jaccard (the MinHash verification semantics)."""
    cap = (
        f"sdf AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= {max_shingle_df}),\n"
        "shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN sdf USING (shingle)),"
        if max_shingle_df is not None
        else "shf AS (SELECT doc_id, shingle FROM sh),"
    )
    return f"""
WITH {_RAW_TOK_CTE},
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(0, greatest(len(toks) - 3, -1) + 1),
                                 i -> array_to_string(toks[i+1:i+3], ' '))) AS shingle
    FROM rawtok WHERE len(toks) >= 3)
),
{cap}
sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM shf a JOIN shf b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
jac AS (
  SELECT doc_a, doc_b, i * 1.0 / (sa.n + sb.n - i) AS jaccard
  FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
)
"""


_SHINGLE_CTE = _shingle_jaccard_cte(1000)
_SHINGLE_CTE_EXACT = _shingle_jaccard_cte(None)

_LANG_CASE = " ".join(
    # priority en > de > es > fr on ties (mirrors lang_id_col's reversed loop)
    [
        f"WHEN v_{lang} >= 1 AND "
        + " AND ".join(
            f"v_{lang} >= v_{other}"
            for other in list(LANG_MARKERS)[i + 1 :]
        )
        + f" THEN '{lang}'"
        if i + 1 < len(LANG_MARKERS)
        else f"WHEN v_{lang} >= 1 THEN '{lang}'"
        for i, lang in enumerate(LANG_MARKERS)
    ]
)

_LANG_VOTES_SQL = ", ".join(
    "len(list_filter(toks, x -> x IN ("
    + ", ".join(f"'{m}'" for m in markers)
    + f"))) AS v_{lang}"
    for lang, markers in LANG_MARKERS.items()
)


# ---------------------------------------------------------------------------
# LSH / simhash oracle generators. These make the three formerly
# `no_oracle` rows full value-hash gates:
#   * the random-hyperplane buckets are deterministic given the seed, so
#     the planes are inlined as SQL literals and DuckDB recomputes the
#     exact candidate sets (sign of a 64-term double dot product — both
#     engines evaluate in float64; ties at exactly 0.0 are measure-zero);
#   * xxhash64 has no DuckDB builtin, so the term->hash map is materialized
#     as a VALUES table from the repo's bit-verified Python clone
#     (colbert_jl_spark/functions/hashing.py, property-gated against the
#     JVM implementation in tests/test_tokenizer.py).
# ---------------------------------------------------------------------------


def _bucket_sql(emb_expr: str, planes_t: list[list[float]]) -> str:
    """SQL for one hash table's bucket id: sum_i [dot(v, plane_i) > 0] << i
    — textually mirrors similarity.lsh_buckets."""
    terms = []
    for i, plane in enumerate(planes_t):
        lit = "[" + ", ".join(repr(float(x)) for x in plane) + "]"
        terms.append(
            f"CASE WHEN list_dot_product({emb_expr}, {lit}) > 0 "
            f"THEN {1 << i} ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


def _ann_lsh_oracle_sql() -> str:
    from colbert_jl_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(_EMB_DIM, _ANN_PLANES, _ANN_TABLES, seed=42)
    eb_cols = ", ".join(
        f"{_bucket_sql('emb', planes[t])} AS b{t}" for t in range(_ANN_TABLES)
    )
    collide = " OR ".join(f"e.b{t} = q.b{t}" for t in range(_ANN_TABLES))
    return f"""
        WITH base AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
        ),
        eb AS (SELECT vec_id, emb, {eb_cols} FROM base),
        qb AS (SELECT vec_id AS qvec_id, emb AS qemb,
                      {", ".join(f"b{t}" for t in range(_ANN_TABLES))}
               FROM eb WHERE vec_id < 5),
        cand AS (
          SELECT DISTINCT q.qvec_id, e.vec_id
          FROM eb e JOIN qb q ON ({collide})
          WHERE e.vec_id <> q.qvec_id
        ),
        scored AS (
          SELECT c.qvec_id, c.vec_id,
                 list_cosine_similarity(e.emb, q.qemb) AS cos
          FROM cand c
          JOIN eb e ON c.vec_id = e.vec_id
          JOIN qb q ON c.qvec_id = q.qvec_id
        )
        SELECT qvec_id, CAST(rank AS INTEGER) AS rank, vec_id,
               round(cos, 6) AS cosine
        FROM (
          SELECT qvec_id, vec_id, cos,
                 row_number() OVER (PARTITION BY qvec_id
                                    ORDER BY round(cos, 6) DESC, vec_id) AS rank
          FROM scored)
        WHERE rank <= 5
    """


def _neardup_lsh_oracle_sql(threshold: float = 0.4) -> str:
    from colbert_jl_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(_EMB_DIM, _NEARDUP_PLANES, _NEARDUP_TABLES, seed=42)
    eb_cols = ", ".join(
        f"{_bucket_sql('emb', planes[t])} AS b{t}" for t in range(_NEARDUP_TABLES)
    )
    collide = " OR ".join(f"a.b{t} = b.b{t}" for t in range(_NEARDUP_TABLES))
    return f"""
        WITH base AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
        ),
        eb AS (SELECT vec_id, emb, {eb_cols} FROM base),
        cand AS (
          SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM eb a JOIN eb b ON a.vec_id < b.vec_id AND ({collide})
        ),
        scored AS (
          SELECT c.vec_a, c.vec_b,
                 list_cosine_similarity(ea.emb, eb2.emb) AS cos
          FROM cand c
          JOIN eb ea ON c.vec_a = ea.vec_id
          JOIN eb eb2 ON c.vec_b = eb2.vec_id
        )
        SELECT vec_a, vec_b, round(cos, 6) AS cosine
        FROM scored WHERE cos >= {threshold}
    """


def _simhash_oracle_sql(max_hamming: int = 3) -> str:
    """Exact simhash recomputation: term->xxhash64 from the Python clone as
    a VALUES table (vocabulary read from the gate's sf dir — the driver
    oracles at sf0.01, override via SPARK_GRAFT_ORACLE_SF_DIR), per-bit
    tf-weighted sign sums and 63-bit assembly in SQL, then an all-pairs
    Hamming join (quadratic is fine for an oracle; the ENGINE side stays
    banded).

    Two guards against a vocabulary mismatch silently corrupting the gate
    (ADVICE r2): terms are asserted [a-z0-9]+ BEFORE being interpolated
    into SQL literals (the tokenizer guarantees it; the assert makes the
    injection-safety assumption explicit), and the hash attach is a LEFT
    join that raises error() on any term absent from the inlined VALUES —
    grading a different corpus fails loudly instead of dropping bits."""
    import os
    import re

    import duckdb

    from colbert_jl_spark.functions.hashing import xxhash64

    sf = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    vocab = duckdb.sql(
        f"""SELECT DISTINCT unnest(
              (list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> ''))[1:{CFG.doc_maxlen}]) AS t
            FROM '{sf}/documents.parquet'"""
    ).fetchall()
    safe = re.compile(r"^[a-z0-9]+$")
    for (t,) in vocab:
        assert safe.match(t), f"tokenizer emitted a non-[a-z0-9]+ term: {t!r}"
    values = ", ".join(
        f"('{t}', CAST({xxhash64(t.encode('utf-8'))} AS UBIGINT))"
        for (t,) in sorted(vocab)
    )
    bit_sums = ", ".join(
        f"sum(tf * (2 * CAST((h >> {i}) & 1 AS BIGINT) - 1)) AS b{i}"
        for i in range(63)
    )
    assemble = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(63)
    )
    return f"""
        WITH {_RAW_TOK_CTE},
        tf AS (
          SELECT doc_id, term, count(*) AS tf
          FROM (SELECT doc_id, unnest(toks) AS term FROM rawtok)
          GROUP BY 1, 2
        ),
        th(term, h) AS (VALUES {values}),
        hashed AS (
          SELECT t.doc_id, t.tf,
                 CASE WHEN th.h IS NULL
                      THEN error('term missing from inlined simhash vocabulary: ' || t.term)
                      ELSE th.h END AS h
          FROM tf t LEFT JOIN th USING (term)
        ),
        bits AS (
          SELECT doc_id, {bit_sums}
          FROM hashed GROUP BY 1
        ),
        sh AS (SELECT doc_id, {assemble} AS simhash FROM bits)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def _phrase_values_sql() -> str:
    """(pid, term, off, plen) VALUES rows for the phrase oracle, tokenized
    with the ENGINE's own raw tokenizer (py_tokens) so both sides split
    the phrase identically; terms are [a-z0-9]+ by construction (safe to
    interpolate)."""
    from colbert_jl_spark.functions.tokenizer import py_tokens

    rows = []
    for pid, text in PHRASE_SET:
        toks = py_tokens(text, None)
        for off, tok in enumerate(toks):
            rows.append(
                f"(CAST({pid} AS BIGINT), '{tok}', {off}, {len(toks)})"
            )
    return ", ".join(rows)


def _extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_clusters": q_dedup_clusters,
        "dedup_incremental": q_dedup_incremental,
        "dedup_simhash": q_dedup_simhash,
        "knn_cosine": q_knn_cosine,
        "ann_cosine_lsh": q_ann_cosine_lsh,
        "embedding_neardup": q_embedding_neardup,
        "lang_id": q_lang_id,
        "quality": q_quality,
        "fingerprint": q_fingerprint,
        "agg_pricing_summary": q_agg_pricing_summary,
        "join_top_customers": q_join_top_customers,
        "doc_offsets": q_doc_offsets,
        "doclen_quantiles": q_doclen_quantiles,
        "extract_text": q_extract_text,
        "posting_runs": q_posting_runs,
        "relevance_labels": q_relevance_labels,
        "phrase_match": q_phrase_match,
    }


def _extra_oracles() -> dict[str, str]:
    return {
        "dedup_exact": """
            SELECT doc_id, md5(text) AS text_hash,
                   min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_doc_id,
                   doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
            FROM documents
        """,
        "dedup_ngram_jaccard": _SHINGLE_CTE
        + "SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM jac WHERE jaccard >= 0.5",
        # LSH banding (16x4) recall at jaccard>=0.8 is ~0.9998 → the exact
        # computation IS the oracle. Verification is UNcapped true Jaccard
        # (candidate-bounded engine-side), so the oracle is too.
        "dedup_minhash_lsh": _SHINGLE_CTE_EXACT
        + "SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM jac WHERE jaccard >= 0.8",
        # connected components as a RECURSIVE reachability walk: comp(v) =
        # MIN over all nodes that can reach v through the >=0.8 edge set
        # (edges are symmetric, so that min IS the component minimum);
        # UNION (not UNION ALL) dedupes (node, comp) states → terminates
        "dedup_clusters": _SHINGLE_CTE_EXACT.replace(
            "WITH ", "WITH RECURSIVE ", 1
        )
        + """,
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM jac WHERE jaccard >= 0.8
  UNION ALL
  SELECT doc_b, doc_a FROM jac WHERE jaccard >= 0.8
),
walk(node, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.node
)
SELECT node AS doc_id, MIN(comp) AS component_id FROM walk GROUP BY node""",
        # the incremental (2-wave DedupIndex) path must land on EXACTLY
        # the same clusters as from-scratch — same oracle as above
        "dedup_incremental": _SHINGLE_CTE_EXACT.replace(
            "WITH ", "WITH RECURSIVE ", 1
        )
        + """,
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM jac WHERE jaccard >= 0.8
  UNION ALL
  SELECT doc_b, doc_a FROM jac WHERE jaccard >= 0.8
),
walk(node, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.node
)
SELECT node AS doc_id, MIN(comp) AS component_id FROM walk GROUP BY node""",
        "knn_cosine": """
            WITH q AS (
              SELECT vec_id AS qvec_id, CAST(embedding AS DOUBLE[]) AS qemb
              FROM embeddings WHERE vec_id < 5
            ),
            scored AS (
              SELECT q.qvec_id, e.vec_id,
                     list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qemb) AS cos
              FROM embeddings e, q WHERE e.vec_id <> q.qvec_id
            )
            SELECT qvec_id, CAST(rank AS INTEGER) AS rank, vec_id,
                   round(cos, 6) AS cosine
            FROM (
              SELECT qvec_id, vec_id, cos,
                     row_number() OVER (PARTITION BY qvec_id
                                        ORDER BY round(cos, 6) DESC, vec_id) AS rank
              FROM scored)
            WHERE rank <= 5
        """,
        "embedding_neardup": _neardup_lsh_oracle_sql(threshold=0.4),
        "ann_cosine_lsh": _ann_lsh_oracle_sql(),
        "dedup_simhash": _simhash_oracle_sql(max_hamming=3),
        "lang_id": f"""
            WITH {_RAW_TOK_CTE},
            votes AS (SELECT doc_id, {_LANG_VOTES_SQL} FROM rawtok)
            SELECT doc_id, CASE {_LANG_CASE} ELSE 'und' END AS lang_pred FROM votes
        """,
        "quality": f"""
            WITH {_RAW_TOK_CTE},
            m AS (
              SELECT r.doc_id,
                     CAST(len(r.toks) AS INTEGER) AS n_tokens,
                     CAST(len(list_filter(string_split_regex(d.text, '\\s+'),
                                          x -> x <> '')) AS INTEGER) AS n_ws_tokens,
                     CAST(length(d.text) AS INTEGER) AS n_chars,
                     len(list_filter(r.toks, x -> x IN ({_STOP_LIST_SQL}))) AS n_stop,
                     list_reduce(list_prepend(CAST(0 AS BIGINT),
                                  list_transform(r.toks, t -> CAST(length(t) AS BIGINT))),
                                 (a, b) -> a + b) AS sum_len
              FROM rawtok r JOIN documents d USING (doc_id)
            ),
            bands AS (
              SELECT doc_id, n_tokens, n_ws_tokens, n_chars,
                     CASE WHEN n_tokens > 0 THEN n_stop * 1.0 / n_tokens ELSE 0.0 END AS stop_ratio,
                     CASE WHEN n_tokens > 0 THEN sum_len * 1.0 / n_tokens ELSE 0.0 END AS mean_len
              FROM m
            )
            SELECT doc_id, n_tokens, n_ws_tokens, n_chars,
                   round((
                     (CASE WHEN n_tokens >= 20 THEN 1.0 WHEN n_tokens >= 5 THEN 0.5 ELSE 0.0 END)
                   + (CASE WHEN stop_ratio >= 0.05 AND stop_ratio <= 0.6 THEN 1.0
                           WHEN stop_ratio > 0.0 THEN 0.5 ELSE 0.0 END)
                   + (CASE WHEN mean_len >= 2.5 AND mean_len <= 12.0 THEN 1.0 ELSE 0.5 END)
                   ) / 3.0, 6) AS quality
            FROM bands
        """,
        "fingerprint": f"""
            WITH {_RAW_TOK_CTE}
            SELECT doc_id,
                   list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                       list_transform(toks, t ->
                         list_reduce(
                           list_prepend(CAST(0 AS BIGINT),
                             list_transform(range(1, length(t) + 1),
                                            i -> CAST(ascii(t[i:i]) AS BIGINT))),
                           (a, c) -> (a * 131 + c) % 2147483647))),
                     (acc, th) -> (acc * 31 + th) % 2147483647) AS fingerprint
            FROM rawtok
        """,
        # extraction is required to be the byte-identity inverse of the
        # page template, so the oracle is simply the source text per url
        "extract_text": """
            SELECT printf('https://example.org/doc/%08d', doc_id) AS url,
                   text
            FROM documents
        """,
        "posting_runs": f"""
            WITH {_DOC_TOK_CTE}
            SELECT term,
                   CAST(doc_id % {CFG.salt_buckets} AS INTEGER) AS salt,
                   CAST(count(*) OVER (PARTITION BY term, doc_id % {CFG.salt_buckets})
                        AS BIGINT) AS sub_df,
                   CAST(row_number() OVER (PARTITION BY term, doc_id % {CFG.salt_buckets}
                                           ORDER BY doc_id) - 1 AS INTEGER) AS pos,
                   doc_id, tf
            FROM tf
        """,
        "phrase_match": f"""
            WITH {_RAW_TOK_CTE},
            rawpos AS (
              SELECT doc_id, unnest(toks) AS term,
                     CAST(unnest(range(len(toks))) AS INTEGER) AS pos
              FROM rawtok
            ),
            ph(pid, term, off, plen) AS (VALUES {_phrase_values_sql()}),
            starts AS (
              SELECT p.pid, p.plen, r.doc_id, r.pos - p.off AS start
              FROM rawpos r JOIN ph p USING (term)
              WHERE r.pos - p.off >= 0
            ),
            occ AS (
              SELECT pid, plen, doc_id, start, count(*) AS m
              FROM starts GROUP BY 1, 2, 3, 4
            )
            SELECT pid, doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
            FROM occ WHERE m = plen GROUP BY 1, 2
        """,
        "relevance_labels": f"""
            WITH {_DOC_TOK_CTE}, {_QUERY_TOK_CTE},
            qd AS (SELECT DISTINCT qid, term FROM qtf),
            qn AS (SELECT qid, count(*) AS n_terms FROM qd GROUP BY 1),
            hits AS (
              SELECT q.qid, t.doc_id, count(*) AS nt
              FROM qd q JOIN tf t USING (term) GROUP BY 1, 2
            )
            SELECT h.qid, h.doc_id
            FROM hits h JOIN qn USING (qid)
            WHERE h.nt = qn.n_terms
        """,
        "doc_offsets": f"""
            WITH {_DOC_TOK_CTE}
            SELECT doc_id, doclen,
                   CAST(COALESCE(SUM(doclen) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offset
            FROM docstats
        """,
        "doclen_quantiles": f"""
            WITH {_DOC_TOK_CTE}
            """
        + " UNION ALL ".join(
            f"SELECT '{kind}' AS kind, CAST({i} AS INTEGER) AS idx, "
            f"round({p}, 6) AS prob, "
            f"round(quantile_cont(doclen, {p}), 6) AS value FROM docstats"
            for kind, probs in (
                ("cutoff", [i / 4 for i in range(1, 4)]),
                ("weight", [i / 4 + 1 / 8 for i in range(4)]),
            )
            for i, p in enumerate(probs)
        ),
        "agg_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem GROUP BY 1, 2
        """,
        "join_top_customers": """
            SELECT CAST(rank AS INTEGER) AS rank, c_custkey, c_name, revenue
            FROM (
              SELECT c.c_custkey, c.c_name,
                     round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                     row_number() OVER (
                       ORDER BY round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) DESC,
                                c.c_custkey) AS rank
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              GROUP BY 1, 2)
            WHERE rank <= 10
        """,
    }
