"""Common-Crawl-style pages table (BASELINE.json input_hint).

Schema: (url: string, warc_ts: timestamp, html: binary, text: string,
lang: string). Two constructors:

* ``pages_from_documents`` — wraps the driver's ``documents`` parquet into
  the pages shape deterministically (html = fixed template around text), so
  every test/bench input derives from the provided testdata.
* ``synth_pages`` — fully synthetic seeded corpus for unit tests
  (FIXTURES.md §1): Zipf-ish vocabulary, ~1% needle markers.

The fixed HTML template makes ``extract_text(html) == text`` a testable
BYTE-identity per url — the engine's per-row invariant (input_hint), the
analogue of the reference pinning its tokenizer outputs
(reference src/modelling/tokenization/doc_tokenization.jl:61-141).
Everything is built with Catalyst expressions (concat/encode) — the html
wrapping never leaves the JVM.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Keep in lockstep with functions.tokenizer._TEMPLATE_RE
HTML_PREFIX = "<html><head><title>t{i}</title></head><body><p>"
HTML_SUFFIX = "</p></body></html>"
BASE_TS = "2024-10-22 00:00:00"


def pages_from_documents(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, ...) → pages(url, warc_ts, html, text, lang).

    url is a deterministic function of doc_id (unique key); warc_ts =
    BASE_TS + doc_id seconds; html wraps text in the fixed template.
    """
    return docs.select(
        F.format_string("https://example.org/doc/%08d", F.col("doc_id")).alias("url"),
        (F.to_timestamp(F.lit(BASE_TS)) + F.make_dt_interval(secs=F.col("doc_id"))).alias("warc_ts"),
        F.encode(
            F.concat(
                F.format_string("<html><head><title>t%d</title></head><body><p>", F.col("doc_id")),
                F.col("text"),
                F.lit(HTML_SUFFIX),
            ),
            "UTF-8",
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )


# ---------------------------------------------------------------------------
# Fully synthetic corpus (unit-test fixture, FIXTURES.md §1) — driver-side
# numpy generation, deterministic under seed; sizes are test-scale only.
# ---------------------------------------------------------------------------

_VOCAB_SIZE = 5000
_ZIPF_S = 1.07


def _zipf_probs(n: int, s: float) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    w = ranks ** (-s)
    return w / w.sum()


def synth_pages(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    mean_len: int = 60,
    needle_fraction: float = 0.01,
) -> DataFrame:
    """Seeded synthetic pages: Zipf(s=1.07) over vocab w0..w4999 (head-term
    skew by construction), lognormal doclen ~ mean_len clamped to [1, 300],
    ~1% docs carry a unique ``needle{j}`` marker (exact-hit tests)."""
    rng = np.random.default_rng(seed)
    probs = _zipf_probs(_VOCAB_SIZE, _ZIPF_S)
    lens = np.clip(
        np.round(rng.lognormal(np.log(mean_len), 0.6, size=n_docs)).astype(int), 1, 300
    )
    needle_docs = rng.choice(n_docs, size=max(1, int(n_docs * needle_fraction)), replace=False)
    rows = []
    for i in range(n_docs):
        toks = [f"w{k}" for k in rng.choice(_VOCAB_SIZE, size=lens[i], p=probs)]
        if i in needle_docs:
            toks.append(f"needle{i}")
        text = " ".join(toks)
        rows.append((i, text, "en" if i % 50 else "de"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    docs = spark.createDataFrame(pdf)
    return pages_from_documents(docs)


def docs_from_pages(pages: DataFrame) -> DataFrame:
    """pages → (doc_id, text, lang): recover a stable numeric doc id from the
    url (the generator embeds it). For arbitrary urls the engine instead
    assigns ``xxhash64(url)`` — both paths are deterministic per url."""
    return pages.select(
        F.regexp_extract("url", r"(\d+)$", 1).cast("long").alias("doc_id"),
        "text",
        "lang",
    )
