"""Golden end-to-end: a tiny corpus scored by an INDEPENDENT pure-Python
BM25 implementation (third engine besides Spark and DuckDB), pinning both
the exhaustive oracle and the WAND executor — the analogue of the
reference README's pinned 10-doc walkthrough result
(reference README.md:153-156: search(...,2) == ([10, 8], [5.9721, 3.7733]))."""

from __future__ import annotations

import math
import re

import pytest

from colbert_jl_spark.config import STOPWORDS, EngineConfig
from colbert_jl_spark.operators.bm25 import bm25_topk
from colbert_jl_spark.operators.wand import wand_topk_inline

DOCS = [
    (0, "cat dog"),
    (1, "cat cat fish"),
    (2, "dog bird bird bird"),
    (3, "the a of"),            # all stopwords → doclen 0
    (4, "fish cat dog bird fish"),
]
QUERIES = [(0, "cat"), (1, "cat fish"), (2, "penguin")]
K1, B = 1.2, 0.75


def _tok(text: str) -> list[str]:
    return [
        t for t in re.split(r"[^a-z0-9]+", text.lower())
        if t and t not in STOPWORDS
    ]


def _python_bm25(docs, queries, k=10):
    """Independent implementation — shares NO code with the engine."""
    toks = {d: _tok(t) for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df: dict[str, int] = {}
    for terms in toks.values():
        for t in set(terms):
            df[t] = df.get(t, 0) + 1
    out = []
    for qid, q in queries:
        qterms = _tok(q)
        qtf = {t: qterms.count(t) for t in set(qterms)}
        scores: dict[int, float] = {}
        for d, terms in toks.items():
            s = 0.0
            for t, qf in qtf.items():
                tf = terms.count(t)
                if tf == 0 or t not in df:
                    continue
                idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += qf * idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * len(terms) / avgdl))
            if s > 0:
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:k]
        out.extend(
            (qid, r + 1, d, round(s, 6)) for r, (d, s) in enumerate(ranked)
        )
    return sorted(out)


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def tiny_q(spark):
    return spark.createDataFrame(QUERIES, "qid long, query string")


def test_oracle_matches_independent_python(spark, tiny, tiny_q):
    want = _python_bm25(DOCS, QUERIES)
    got = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in bm25_topk(tiny, tiny_q, EngineConfig()).collect()
    )
    assert got == want


def test_wand_matches_independent_python(spark, tiny, tiny_q):
    want = _python_bm25(DOCS, QUERIES)
    got = sorted(
        (r.qid, r.rank, r.doc_id, r.score)
        for r in wand_topk_inline(spark, tiny, tiny_q, EngineConfig(block_size=2)).collect()
    )
    assert got == want


def test_golden_semantics(spark, tiny, tiny_q):
    """Hand-checkable facts: 'cat' ranks d1 (tf=2) above d0/d4 adjusting for
    length; zero-df query 'penguin' returns nothing; all-stopword doc 3
    never appears."""
    rows = bm25_topk(tiny, tiny_q, EngineConfig()).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    assert 2 not in by_q                      # penguin: zero-df
    assert all(r.doc_id != 3 for r in rows)   # stopword-only doc
    q0 = sorted(by_q[0], key=lambda r: r.rank)
    assert q0[0].doc_id == 1                  # highest tf, shortish doc
    assert {r.doc_id for r in q0} == {0, 1, 4}
