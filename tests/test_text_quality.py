"""Truncation-boundary parity for the text-quality operators.

Round-1 gap (VERDICT.md "What's wrong #2"): lang_id / quality /
token_counts / fingerprint tokenized UNtruncated while their DuckDB oracle
sliced at doc_maxlen=300 — invisible because every driver fixture doc has
<=100 tokens. This test builds documents that straddle the boundary
(299 / 300 / 301 / 450 tokens, plus an all-stopword and an empty doc) and
runs the REAL driver queries + REAL oracle SQL from __spark_entry__ on
them, so any future lockstep drift fails here before it can pass the gate.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry
from colbert_jl_spark.config import EngineConfig

CFG = EngineConfig()


def _boundary_docs() -> pd.DataFrame:
    ml = CFG.doc_maxlen  # 300
    mk = lambda n, pattern: " ".join(pattern[i % len(pattern)] for i in range(n))
    en = ["the", "data", "and", "pipeline", "of", "spark", "is", "fast"]
    de = ["der", "index", "und", "das", "ist", "nicht", "ein", "plan"]
    rows = [
        (0, mk(ml - 1, en)),          # just under the boundary
        (1, mk(ml, en)),              # exactly at the boundary
        (2, mk(ml + 1, en)),          # first truncated token
        (3, mk(ml + 150, de)),        # deep past the boundary, non-en
        # language flips under truncation: 300 German tokens then 600
        # English tokens — truncated vote says de, untruncated says en
        (4, mk(ml, de) + " " + mk(2 * ml, en)),
        (5, "the and of is to in that it"),  # all stopwords
        (6, ""),                       # empty
        (7, mk(40, en)),               # short control doc
    ]
    return pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["fixture"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    )


@pytest.fixture(scope="module")
def boundary_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("boundary")
    pdf = _boundary_docs()
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d)


@pytest.mark.parametrize("name", ["lang_id", "quality", "fingerprint", "docstats"])
def test_boundary_docs_match_oracle(spark, boundary_dir, name):
    sdf = entry.queries()[name](spark, boundary_dir).toPandas()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{boundary_dir}/documents.parquet/*.parquet')"
    )
    ddf = con.execute(entry.oracle_sql()[name]).fetchdf()

    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    d = ddf[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        sv, dv = s[c], d[c]
        if sv.dtype.kind == "f" or dv.dtype.kind == "f":
            pd.testing.assert_series_equal(
                sv.astype(float), dv.astype(float),
                check_names=False, rtol=0, atol=0, obj=f"{name}.{c}",
            )
        else:
            assert sv.astype(str).tolist() == dv.astype(str).tolist(), f"{name}.{c}"


def test_truncation_actually_bites(spark, boundary_dir):
    """Sanity that the fixture exercises the boundary: doc 2's n_tokens is
    capped at doc_maxlen, and doc 4's language under truncation (de)
    differs from its untruncated majority (en)."""
    q = entry.queries()["quality"](spark, boundary_dir).toPandas().set_index("doc_id")
    assert q.loc[2, "n_tokens"] == CFG.doc_maxlen
    assert q.loc[3, "n_tokens"] == CFG.doc_maxlen
    # whitespace count is the UNtruncated convention, so it still exceeds
    assert q.loc[2, "n_ws_tokens"] == CFG.doc_maxlen + 1

    lang = entry.queries()["lang_id"](spark, boundary_dir).toPandas().set_index("doc_id")
    assert lang.loc[4, "lang_pred"] == "de"
    assert lang.loc[5, "lang_pred"] == "en"  # stopwords are en markers too
    assert lang.loc[6, "lang_pred"] == "und"
