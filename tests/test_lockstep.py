"""Config↔oracle lockstep gate (VERDICT r2 item 10).

The DuckDB oracle SQL strings in __spark_entry__ inline the frozen
tokenizer/scoring constants (doc_maxlen, k1, b, stoplist, split regex).
Any tokenizer or scoring change that edits EngineConfig without updating
the oracle CTEs in the same commit must fail HERE, before the driver's
value-hash gate ever runs — this test round-trips the EngineConfig
constants into the oracle strings and asserts they appear verbatim.

No Spark session needed: pure string checks over the oracle dict.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from colbert_jl_spark.config import STOPWORDS, TOKEN_SPLIT_RE, EngineConfig

CFG = EngineConfig()


@pytest.fixture(scope="module")
def oracles() -> dict[str, str]:
    return entry.oracle_sql()


def test_entry_cfg_is_the_default_config():
    """__spark_entry__ must grade the default EngineConfig — a customized
    CFG there would silently diverge from what the engine ships."""
    assert entry.CFG == CFG


def test_doc_maxlen_inlined_in_tokenizing_oracles(oracles):
    needle = f"[1:{CFG.doc_maxlen}]"
    for name in ("bm25_topk", "docstats", "term_df", "postings",
                 "dedup_simhash", "lang_id", "quality", "fingerprint"):
        assert needle in oracles[name], (name, needle)


def test_token_split_regex_inlined(oracles):
    assert TOKEN_SPLIT_RE == CFG.token_split_re  # frozen alias stays bound
    needle = f"string_split_regex(lower(text), '{CFG.token_split_re}')"
    for name in ("bm25_topk", "docstats", "dedup_simhash", "quality"):
        assert needle in oracles[name], name


def test_stoplist_inlined_verbatim(oracles):
    assert tuple(CFG.stopwords) == STOPWORDS
    stop_sql = ", ".join(f"'{w}'" for w in CFG.stopwords)
    for name in ("bm25_topk", "docstats", "term_df"):
        assert stop_sql in oracles[name], name
    # quality's stop_ratio must filter the same set
    assert stop_sql in oracles["quality"]


def test_bm25_constants_inlined(oracles):
    sql = oracles["bm25_topk"]
    # the BM25 expression inlines k1, b and (k1+1) as repr'd floats —
    # repr round-trips doubles identically in Python and DuckDB
    assert f"* {CFG.k1 + 1.0})" in sql
    assert f"+ {CFG.k1} * (1 - {CFG.b} + {CFG.b} *" in sql
    assert f"rank <= {CFG.top_k}" in sql
    # the conjunctive referee scores with the same constants
    conj = oracles["bm25_conjunctive"]
    assert f"* {CFG.k1 + 1.0})" in conj
    assert f"+ {CFG.k1} * (1 - {CFG.b} + {CFG.b} *" in conj


def test_wand_rows_share_the_exhaustive_oracle(oracles):
    """The pruned executors are graded against the SAME SQL as their
    exhaustive referees — rank identity is the contract, so the oracle
    strings must be object-identical (not just equivalent)."""
    assert oracles["wand_topk"] == oracles["bm25_topk"]
    assert oracles["wand_intersect"] == oracles["bm25_conjunctive"]


def test_every_query_has_an_oracle():
    """Driver contract: every queries() entry is value-hash gated (the
    round-2 milestone — no weaker rows-only checks anywhere)."""
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert q == o, q.symmetric_difference(o)
