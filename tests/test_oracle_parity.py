"""Mirror of the driver's correctness gate: every queries() entry that has
an oracle_sql() is run on Spark AND DuckDB at sf0.01 and compared
order-insensitively on exact (rounded) values.

This is the engine's analogue of the reference's oracle-equivalence tests
(reference test/indexing/collection_indexer.jl:286-305 exact-expectation
style, applied end-to-end)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF01

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf


def _query_names():
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    return [n for n in entry.queries() if n in oracles]


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, name):
    import __spark_entry__ as entry

    sdf = entry.queries()[name](spark, SF01)
    spark_pdf = sdf.toPandas()

    con = _duck(SF01)
    duck_pdf = con.execute(entry.oracle_sql()[name]).fetchdf()

    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(duck_pdf)} (duckdb)"
    )
    s, d = _canon(spark_pdf), _canon(duck_pdf)
    assert list(s.columns) == list(d.columns), f"{name}: columns {list(s.columns)} != {list(d.columns)}"
    for col in s.columns:
        sv, dv = s[col], d[col]
        if sv.dtype.kind == "f" or dv.dtype.kind == "f":
            pd.testing.assert_series_equal(
                sv.astype(float), dv.astype(float), check_names=False,
                rtol=0, atol=0, obj=f"{name}.{col}",
            )
        else:
            assert sv.astype(str).tolist() == dv.astype(str).tolist(), f"{name}.{col} mismatch"
