"""The per-row invariant from BASELINE.json input_hint: extracted text is
BYTE-identical to the source text per url, through the full Spark path
(html binary column → vectorized Arrow UDF → string column)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from colbert_jl_spark.functions.tokenizer import extract_text
from colbert_jl_spark.sources.pages import (
    docs_from_pages,
    pages_from_documents,
    synth_pages,
)


def test_extract_text_byte_identity_on_testdata(spark, docs01):
    """pages built from the driver's documents table: extract_text(html)
    must equal text for EVERY url — compared via binary equality of the
    UTF-8 encodings (byte identity, not string display equality)."""
    pages = pages_from_documents(docs01)
    mism = pages.select(
        "url",
        F.encode(extract_text("html"), "UTF-8").alias("got"),
        F.encode(F.col("text"), "UTF-8").alias("want"),
    ).where(F.col("got") != F.col("want"))
    assert mism.count() == 0
    assert pages.count() == docs01.count()


def test_extract_text_byte_identity_synth(spark):
    pages = synth_pages(spark, 200, seed=7)
    mism = pages.select(
        F.encode(extract_text("html"), "UTF-8").alias("got"),
        F.encode(F.col("text"), "UTF-8").alias("want"),
    ).where(F.col("got") != F.col("want"))
    assert mism.count() == 0


def test_pages_schema_matches_input_hint(spark, docs001):
    pages = pages_from_documents(docs001)
    assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    types = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
    assert types == {
        "url": "string",
        "warc_ts": "timestamp",
        "html": "binary",
        "text": "string",
        "lang": "string",
    }
    # url is a unique key
    n = pages.count()
    assert pages.select("url").distinct().count() == n


def test_docs_from_pages_roundtrip(spark, docs001):
    pages = pages_from_documents(docs001)
    back = docs_from_pages(pages)
    a = docs001.select("doc_id", "text", "lang").orderBy("doc_id").collect()
    b = back.orderBy("doc_id").collect()
    assert a == b


def test_extract_text_generic_fallback(spark):
    """Non-template HTML goes through the documented tag-stripping
    fallback (not byte-exact by definition — but must not crash and must
    recover visible text)."""
    rows = [(bytearray(b"<div><span>some</span> other <b>layout</b></div>"),)]
    df = spark.createDataFrame(rows, "html binary")
    got = df.select(extract_text("html").alias("t")).first().t
    assert "some" in got and "layout" in got
