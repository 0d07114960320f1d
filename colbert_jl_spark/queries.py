"""The reference query set (FIXTURES.md §2).

Fixed, deterministic queries over the testdata ``documents`` vocabulary,
including the edge cases the reference's tests pin (empty candidate sets,
zero-df terms — reference test/search/ranking.jl:100-121,
test/searching.jl:14-17):

* q5 — single head term (max-skew edge),
* q6 — all-stopword query (empty result),
* q7 — term absent from the corpus (zero-df, empty result).

Used verbatim by __spark_entry__.queries() (Spark side) and
__spark_entry__.oracle_sql() (DuckDB side) so both engines score the
identical query set.
"""

from __future__ import annotations

QUERY_SET: list[tuple[int, str]] = [
    (0, "spark table join"),
    (1, "window merge batch"),
    (2, "slow scan filter sort"),
    (3, "customer order line"),
    (4, "hash group value"),
    (5, "data"),
    (6, "the a of and"),
    (7, "zzzmissingterm"),
    (8, "query data big small fast slow"),
    (9, "stream column row key"),
]


def queries_df(spark):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from colbert_jl_spark.functions.smalldf import local_df

    schema = StructType(
        [StructField("qid", LongType()), StructField("query", StringType())]
    )
    # LocalRelation-backed (functions/smalldf): collecting the query set —
    # which every search entry does — must not schedule a Spark job
    return local_df(spark, QUERY_SET, schema)


def queries_sql_values() -> str:
    """VALUES clause for the DuckDB oracle."""
    rows = ", ".join(f"({qid}, '{q}')" for qid, q in QUERY_SET)
    return f"(VALUES {rows}) AS queries(qid, query)"
