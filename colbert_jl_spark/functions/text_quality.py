"""Text-analysis functions for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All four are pure Catalyst column expressions (whole-stage codegen; zero
Python) and every one is DuckDB-expressible, so each gets a full value-hash
oracle in __spark_entry__. Deterministic by construction — the point is
pipeline-grade reproducibility, not linguistic perfection (the language-ID
heuristic is a marker-word vote, the standard cheap first-pass filter in
web-corpus pipelines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from colbert_jl_spark.config import STOPWORDS
from colbert_jl_spark.functions.tokenizer import tokens_col

# marker-word vote lists (frozen; mirrored into the oracle SQL). Order is
# the tie-break priority.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "to", "in", "that", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "de", "que", "y", "los", "es", "una"),
    "fr": ("le", "la", "les", "et", "est", "des", "une", "que"),
}

_FP_MOD = 2147483647  # 2^31 - 1: products stay < 2^63 in both engines


def _isin_filter(markers: tuple[str, ...]):
    # one-arg lambda factory: a two-arg lambda (t, m=...) would be treated
    # by Spark's higher-order filter as the (element, index) form
    return lambda t: t.isin(*markers)


def lang_votes(text: Column | str, doc_maxlen: int | None = None) -> dict[str, Column]:
    toks = tokens_col(text, doc_maxlen)
    return {
        lang: F.size(F.filter(toks, _isin_filter(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id_col(text: Column | str, doc_maxlen: int | None = None) -> Column:
    """Predicted language: argmax of marker votes, tie-break by list order,
    'und' (undetermined) when no marker hits.

    ``doc_maxlen`` truncates the token stream BEFORE voting — the same
    truncation the indexing path applies (tokenizer.tokens_col), so the
    operator and its oracle stay in lockstep on documents longer than
    doc_maxlen tokens."""
    votes = lang_votes(text, doc_maxlen)
    best = F.lit("und")
    best_n = F.lit(0)
    # iterate in REVERSE priority so earlier languages win ties (>=)
    for lang in reversed(list(LANG_MARKERS)):
        n = votes[lang]
        take = n >= F.greatest(best_n, F.lit(1))
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_n = F.when(take, n).otherwise(best_n)
    return best


def token_counts(text: Column | str, doc_maxlen: int | None = None) -> dict[str, Column]:
    """n_tokens (regex tokenizer, truncated at ``doc_maxlen`` like the
    indexing path), n_ws_tokens (whitespace split, UNtruncated), n_chars —
    the three counting conventions pipelines reconcile."""
    col = F.col(text) if isinstance(text, str) else text
    return {
        "n_tokens": F.size(tokens_col(col, doc_maxlen)),
        "n_ws_tokens": F.size(F.filter(F.split(col, r"\s+"), lambda t: F.length(t) > 0)),
        "n_chars": F.length(col),
    }


def quality_score_col(text: Column | str, doc_maxlen: int | None = None) -> Column:
    """Composite quality in [0,1]: length band + stopword ratio band +
    mean-token-length band (the classic cheap web-text heuristics:
    too-short docs, stopword-free keyword stuffing, and run-on garbage all
    score low). Frozen arithmetic, mirrored in the oracle SQL; ratios are
    computed over the ``doc_maxlen``-truncated stream the index sees."""
    col = F.col(text) if isinstance(text, str) else text
    toks = tokens_col(col, doc_maxlen)
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    stop_ratio = F.when(n > 0, n_stop / n).otherwise(F.lit(0.0))
    mean_len = F.when(
        n > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)) / n,
    ).otherwise(F.lit(0.0))
    length_band = (
        F.when(n >= 20, F.lit(1.0)).when(n >= 5, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    stop_band = (
        F.when((stop_ratio >= 0.05) & (stop_ratio <= 0.6), F.lit(1.0))
        .when(stop_ratio > 0.0, F.lit(0.5))
        .otherwise(F.lit(0.0))
    )
    len_band = (
        F.when((mean_len >= 2.5) & (mean_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    )
    return F.round((length_band + stop_band + len_band) / F.lit(3.0), 6)


def fingerprint_col(text: Column | str, doc_maxlen: int | None = None) -> Column:
    """Order-sensitive 31/131 polynomial rolling hash of the token stream
    mod 2^31-1 — a deterministic document fingerprint reproducible in any
    engine with 64-bit integers (the DuckDB oracle recomputes it exactly).
    The stream is ``doc_maxlen``-truncated like every other text operator.

    fp(doc)  = fold(tokens, acc -> (acc*31 + th(t)) % p)
    th(term) = fold(chars,  acc -> (acc*131 + ascii(c)) % p)
    """
    toks = tokens_col(text, doc_maxlen)
    term_hash = lambda t: F.aggregate(  # noqa: E731
        F.transform(
            F.sequence(F.lit(1), F.length(t)),
            lambda i: F.ascii(t.substr(i, F.lit(1))),
        ),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 131 + c) % _FP_MOD,
    )
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + term_hash(t)) % _FP_MOD,
    )
