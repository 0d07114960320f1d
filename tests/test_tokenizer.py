"""Tokenizer micro-fixtures (FIXTURES.md §6) — pinned (text, expected)
pairs, the analogue of the reference's pinned tokenization matrices
(reference src/modelling/tokenization/doc_tokenization.jl:61-141)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from colbert_jl_spark.config import EngineConfig
from colbert_jl_spark.functions.tokenizer import doclen_col, terms_col, tokens_col

CASES = [
    # (text, expected tokens incl. stopwords, expected terms post-stoplist)
    ("Hello, World!", ["hello", "world"], ["hello", "world"]),
    ("The quick brown fox", ["the", "quick", "brown", "fox"], ["quick", "brown", "fox"]),
    ("a a a the the", ["a", "a", "a", "the", "the"], []),
    ("spark-sql_engine v2.0", ["spark", "sql", "engine", "v2", "0"], ["spark", "sql", "engine", "v2", "0"]),
    ("", [], []),
    ("   ", [], []),
    ("123 456", ["123", "456"], ["123", "456"]),
    ("MiXeD CaSe TeXt", ["mixed", "case", "text"], ["mixed", "case", "text"]),
    ("naïve café", ["na", "ve", "caf"], ["na", "ve", "caf"]),  # ASCII-only split (frozen contract)
    ("dots...and---dashes", ["dots", "and", "dashes"], ["dots", "dashes"]),
]


def test_pinned_tokenization(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(CASES)], "id long, text string"
    )
    out = (
        df.select("id", tokens_col("text").alias("toks"), terms_col("text").alias("terms"))
        .orderBy("id")
        .collect()
    )
    for row, (text, want_toks, want_terms) in zip(out, CASES):
        assert row.toks == want_toks, f"{text!r}: tokens {row.toks} != {want_toks}"
        assert row.terms == want_terms, f"{text!r}: terms {row.terms} != {want_terms}"


def test_doc_maxlen_truncation(spark):
    text = " ".join(f"tok{i}" for i in range(100))
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(tokens_col("text", doc_maxlen=10).alias("t")).first().t
    assert got == [f"tok{i}" for i in range(10)]
    # truncation happens BEFORE stoplist (reference ordering)
    text2 = "the " * 10 + "word"
    got2 = df.sparkSession.createDataFrame([(text2,)], "text string").select(
        terms_col("text", doc_maxlen=10).alias("t")
    ).first().t
    assert got2 == []  # first 10 tokens are all 'the' → stoplisted away


def test_python_mirror_equals_catalyst(spark, docs001):
    """py_tokens/py_terms (driver-side query tokenization) must be
    byte-identical to the Catalyst expressions over real corpus text."""
    from colbert_jl_spark.functions.tokenizer import py_terms, py_tokens

    rows = docs001.select(
        "text",
        tokens_col("text", 300).alias("toks"),
        terms_col("text", 300).alias("terms"),
    ).collect()
    for r in rows:
        assert py_tokens(r.text, 300) == r.toks
        assert py_terms(r.text, 300) == r.terms
    for text, want_toks, want_terms in CASES:
        assert py_tokens(text) == want_toks
        assert py_terms(text) == want_terms


def test_python_xxhash64_equals_spark(spark):
    """The pure-python xxhash64 clone (query-time partition pruning) must
    be bit-identical to F.xxhash64 across length classes (0..100 bytes)."""
    import random
    import string

    from colbert_jl_spark.functions.hashing import spark_pmod_hash, spark_xxhash64

    rng = random.Random(11)
    samples = ["", "a", "ab", "abc", "abcd", "x" * 31, "x" * 32, "x" * 33] + [
        "".join(rng.choices(string.ascii_lowercase + string.digits, k=rng.randint(1, 100)))
        for _ in range(100)
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    rows = df.select(
        "s", F.xxhash64("s").alias("h"), F.pmod(F.xxhash64("s"), F.lit(64)).alias("b")
    ).collect()
    for r in rows:
        assert spark_xxhash64(r.s) == r.h, r.s
        assert spark_pmod_hash(r.s, 64) == r.b, r.s


def test_doclen_matches_terms(spark, docs001):
    cfg = EngineConfig()
    df = docs001.select(
        doclen_col("text", cfg.doc_maxlen).alias("dl"),
        F.size(terms_col("text", cfg.doc_maxlen)).alias("sz"),
    )
    assert df.where("dl != sz").count() == 0
