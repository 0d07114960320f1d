"""Text extraction + tokenization — the engine's P-layer (SURVEY.md §2.2).

Analogue of the reference's tokenization pipeline
(reference src/modelling/tokenization/tokenizer_utils.jl:82-100 P1,
doc_tokenization.jl:143-156 P3) and skiplist masking
(reference src/modelling/embedding_utils.jl:172-177 P5), re-grounded per the
north rule as a deterministic lexical tokenizer.

Design rule: the hot path is 100% JVM-side Catalyst expressions
(``lower`` → ``split`` → ``filter`` → ``slice``) so tokenization runs inside
whole-stage codegen with zero Python crossings — a Python UDF here would be
the single biggest scale mistake for a 100 TB corpus. The only Python is
``extract_text`` (HTML → text), a *vectorized* Arrow UDF (never per-row),
because byte-exact binary decoding isn't expressible as a Catalyst expr.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from colbert_jl_spark.config import STOPWORDS, TOKEN_SPLIT_RE

# --------------------------------------------------------------------------
# HTML → text (S1/extract layer; the byte-identity invariant from input_hint)
# --------------------------------------------------------------------------

# The synthetic pages table (sources/pages.py) wraps text in this fixed
# template; extraction is its exact inverse so extract_text(html) == text
# BYTE-identically per url (the pytest gate). A generic tag-stripper handles
# non-template HTML as a documented fallback (not byte-exact by definition).
_TEMPLATE_RE = re.compile(rb"<body><p>(.*)</p></body>", re.DOTALL)
_TAG_RE = re.compile(rb"<[^>]+>")


def _extract_text_bytes(html: bytes | None) -> str | None:
    if html is None:
        return None
    m = _TEMPLATE_RE.search(html)
    if m is not None:
        return m.group(1).decode("utf-8")
    # generic fallback: strip tags, collapse to the raw text bytes
    return _TAG_RE.sub(b" ", html).decode("utf-8", errors="replace").strip()


def _extract_text_batch(html: pd.Series) -> pd.Series:
    return html.map(_extract_text_bytes)


def extract_text(html: Column | str) -> Column:
    """Vectorized Arrow UDF: html binary → extracted text.

    One Arrow batch per call (the analogue of the reference's
    ``index_bsize`` batched encode loop,
    reference src/modelling/checkpoint.jl:159-189) — pandas applies the
    byte-level inverse of the page template per batch. The UDF is built
    lazily so importing this module never needs a live SparkSession.
    """
    from pyspark.sql.types import StringType

    udf = F.pandas_udf(_extract_text_batch, StringType())
    col = F.col(html) if isinstance(html, str) else html
    return udf(col)


# --------------------------------------------------------------------------
# text → terms (pure Catalyst expressions; WholeStageCodegen end to end)
# --------------------------------------------------------------------------

def tokens_col(text: Column | str, doc_maxlen: int | None = None) -> Column:
    """All tokens of ``text`` in order: lowercase, split on non-alphanumeric,
    drop empties — NO stopword filtering (raw token stream).

    Truncation to ``doc_maxlen`` mirrors the reference's tensorize_docs
    truncate-to-doc_maxlen (reference
    src/modelling/tokenization/doc_tokenization.jl:143-156).
    """
    col = F.col(text) if isinstance(text, str) else text
    toks = F.filter(
        F.split(F.lower(col), TOKEN_SPLIT_RE),
        lambda t: F.length(t) > 0,
    )
    if doc_maxlen is not None:
        toks = F.slice(toks, 1, doc_maxlen)
    return toks


def terms_col(
    text: Column | str,
    doc_maxlen: int | None = None,
    stopwords: tuple[str, ...] = STOPWORDS,
) -> Column:
    """Indexable terms: ``tokens_col`` minus stopwords (order preserved,
    duplicates preserved — term frequency is computed downstream).

    The stopword filter is the P5 skiplist predicate
    (reference src/modelling/embedding_utils.jl:172-177) applied as early
    as possible — the filter sits *before* explode/shuffle, the engine's
    analogue of predicate pushdown for the posting build.

    Truncation happens BEFORE the stopword filter (matching the reference,
    which truncates at tokenize time and masks the skiplist afterwards —
    doc_tokenization.jl:143-156 then embedding_utils.jl:172-177).
    """
    toks = tokens_col(text, doc_maxlen)
    return F.filter(toks, lambda t: ~t.isin(*stopwords))


_PY_SPLIT = re.compile(TOKEN_SPLIT_RE)


def py_tokens(text: str, doc_maxlen: int | None = None) -> list[str]:
    """Driver-side Python mirror of ``tokens_col`` — MUST stay
    byte-identical to the Catalyst expression (property-gated in
    tests/test_tokenizer.py). Used for query tokenization, which is tiny
    driver-side data (the reference also encodes queries driver-side,
    reference src/modelling/checkpoint.jl:271-301)."""
    toks = [t for t in _PY_SPLIT.split(text.lower()) if t]
    return toks[:doc_maxlen] if doc_maxlen is not None else toks


def py_terms(
    text: str,
    doc_maxlen: int | None = None,
    stopwords: tuple[str, ...] = STOPWORDS,
) -> list[str]:
    """Driver-side mirror of ``terms_col`` (truncate THEN stoplist)."""
    stop = set(stopwords)
    return [t for t in py_tokens(text, doc_maxlen) if t not in stop]


def doclen_col(
    text: Column | str,
    doc_maxlen: int | None = None,
    stopwords: tuple[str, ...] = STOPWORDS,
) -> Column:
    """Post-stoplist token count — the reference's ``doclens``
    (reference src/modelling/checkpoint.jl:102-104: #attended tokens/doc)."""
    return F.size(terms_col(text, doc_maxlen, stopwords))
