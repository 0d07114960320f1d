"""Posting-construction semantics: the skew fixture (FIXTURES.md §6 —
salted merge must equal the unsalted path on a corpus where one term
appears in 100% of docs) and the _build_ivf-style exact grouping
(reference test/indexing/collection_indexer.jl:286-305)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from colbert_jl_spark.config import EngineConfig
from colbert_jl_spark.operators.postings import posting_lists, term_df, term_postings
from colbert_jl_spark.operators.stats import (
    doc_offsets,
    doclen_quantiles,
    heldout_split,
    reference_sample_size,
    sample_docs,
)


@pytest.fixture(scope="module")
def skewed(spark):
    """100 docs; 'omni' in every doc (max skew), 'rare' in one."""
    rows = [
        (i, "omni " + " ".join(f"w{j}" for j in range(i % 7)) + (" rare" if i == 42 else ""))
        for i in range(100)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_salted_merge_equals_unsalted(skewed):
    cfg = EngineConfig(salt_buckets=8)
    p = term_postings(skewed, cfg)
    a = {r.term: r.postings for r in posting_lists(p, cfg, salted=True).collect()}
    b = {r.term: r.postings for r in posting_lists(p, cfg, salted=False).collect()}
    assert a.keys() == b.keys()
    for t in a:
        assert a[t] == b[t], f"term {t} differs"
    # head term run covers all docs, sorted
    omni = a["omni"]
    assert [x.doc_id for x in omni] == list(range(100))


def test_posting_array_bound_and_runs_output(skewed):
    """VERDICT r2 item 4: a term whose df exceeds the configured array
    bound must fail LOUDLY on the single-array API (never silently build a
    2 GiB-risk value) while the per-salt runs output handles it fine — and
    merging the runs client-side reproduces the unsalted list exactly."""
    from colbert_jl_spark.operators.postings import posting_runs

    cfg = EngineConfig(salt_buckets=8)
    p = term_postings(skewed, cfg)

    # 'omni' spans all 100 docs > bound of 50 → execution-time error naming
    # the term and the escape hatch, on both the salted and unsalted paths
    for salted in (True, False):
        with pytest.raises(Exception) as exc:
            posting_lists(p, cfg, salted=salted, max_array_len=50).collect()
        assert "max_array_len" in str(exc.value)
        assert "posting_runs" in str(exc.value)

    # the runs surface carries the same postings with NO row over the bound
    runs = posting_runs(p, cfg).collect()
    assert max(r.sub_df for r in runs) <= 50
    merged: dict[str, list] = {}
    for r in runs:
        merged.setdefault(r.term, []).extend(r.sub_run)
    flat = {
        t: sorted((x.doc_id, x.tf) for x in v) for t, v in merged.items()
    }
    want = {
        r.term: [(x.doc_id, x.tf) for x in r.postings]
        for r in posting_lists(p, cfg, salted=False).collect()
    }
    assert flat == want
    # and the bounded API still works when every term fits the bound
    ok = posting_lists(p, cfg, max_array_len=100).collect()
    assert {r.term for r in ok} == set(want)

    # ADVICE r3: the runs surface is SPREAD, not unbounded — a per-salt run
    # over the bound (omni: 100 docs / 8 salts ≈ 12.5 > 10) must also fail
    # loudly, pointing at the salt_buckets sizing fix
    with pytest.raises(Exception) as exc:
        posting_runs(p, cfg, max_array_len=10).collect()
    assert "salt_buckets" in str(exc.value)

    # r4 review: the in-plan guards evaluate on the aggregation OUTPUT —
    # the eager count-only pre-flight is what catches a run too big to
    # materialize at all, BEFORE any array is built
    from colbert_jl_spark.operators.postings import check_run_bounds

    with pytest.raises(RuntimeError, match="omni.*salt_buckets"):
        check_run_bounds(p, cfg, max_array_len=10)
    check_run_bounds(p, cfg, max_array_len=100)  # within bounds: no raise


def test_exact_grouping_small_fixture(spark):
    """Analogue of the reference _build_ivf case: exact grouped, sorted
    posting lists with exact df (codes=[5,3,8,2,5,5,4,2,2,1,3] style)."""
    docs = spark.createDataFrame(
        [(0, "b c"), (1, "b b d"), (2, "c"), (3, "d b")],
        "doc_id long, text string",
    )
    cfg = EngineConfig()
    pl = {r.term: r for r in posting_lists(term_postings(docs, cfg), cfg).collect()}
    assert pl["b"].df == 3
    assert [(x.doc_id, x.tf) for x in pl["b"].postings] == [(0, 1), (1, 2), (3, 1)]
    assert [(x.doc_id, x.tf) for x in pl["c"].postings] == [(0, 1), (2, 1)]
    assert pl["d"].df == 2


def test_dictionary_invariant(skewed):
    """sum(df) == #postings — the reference's sum(ivf_lengths) check
    (test/indexing/collection_indexer.jl:299-300)."""
    cfg = EngineConfig()
    p = term_postings(skewed, cfg)
    d = term_df(p)
    assert d.agg(F.sum("df")).first()[0] == p.count()


def test_sampling_operators(spark, docs01):
    n = docs01.count()
    want = reference_sample_size(n)
    s = sample_docs(docs01, seed=42)
    assert s.count() == want  # exact-n parity with the reference formula
    drawn = sorted(r.doc_id for r in s.collect())
    # deterministic under a fixed seed
    assert drawn == sorted(r.doc_id for r in sample_docs(docs01, seed=42).collect())
    # and LAYOUT-independent: repartitioning the input draws the same docs
    # (the key is xxhash64(doc_id, seed), a row fact — unlike F.rand)
    assert drawn == sorted(
        r.doc_id for r in sample_docs(docs01.repartition(7), seed=42).collect()
    )
    # a different seed draws a different sample (explicit n: at 500 docs the
    # reference formula asks for more than N, so the full-corpus shortcut
    # would make any two seeds trivially equal)
    s42 = sorted(r.doc_id for r in sample_docs(docs01, seed=42, n=50).collect())
    s7 = sorted(r.doc_id for r in sample_docs(docs01, seed=7, n=50).collect())
    assert len(s42) == len(s7) == 50
    assert s42 != s7
    train, held = heldout_split(docs01, 0.05, seed=42)
    assert train.count() + held.count() == n
    assert held.count() < 0.15 * n


def test_doc_offsets_prefix_sum(spark):
    from colbert_jl_spark.operators.docstats import doclens

    docs = spark.createDataFrame(
        [(0, "x y"), (1, "x"), (2, "x y z w")], "doc_id long, text string"
    )
    out = {r.doc_id: (r.doclen, r.offset) for r in doc_offsets(doclens(docs)).collect()}
    assert out == {0: (2, 0), 1: (1, 2), 2: (4, 3)}


def test_doc_offsets_matches_window_form_and_distributes(spark, docs01):
    """Two-phase scan == the single-window spec on real data, and the
    distributed plan contains NO single-partition Exchange (the round-1
    one-task funnel)."""
    from colbert_jl_spark.operators.docstats import doclens
    from colbert_jl_spark.operators.stats import doc_offsets_window

    dl = doclens(docs01).cache()
    try:
        dist = doc_offsets(dl, num_buckets=7)
        ref = doc_offsets_window(dl)
        key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
        assert key(dist) == key(ref)
        plan = dist._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in plan, plan
        assert "rangepartitioning" not in plan.lower() or "hashpartitioning" in plan.lower()
    finally:
        dl.unpersist()


def test_doclen_quantiles_exact(spark):
    from colbert_jl_spark.operators.docstats import doclens

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i + 1))) for i in range(8)],
        "doc_id long, text string",
    )  # doclens 1..8
    q = {(r.kind, r.idx): r.value for r in doclen_quantiles(doclens(docs), nbits=1).collect()}
    # nbits=1: cutoff probs [0.5] → median of 1..8 = 4.5; weights [0.25, 0.75]
    assert q[("cutoff", 0)] == pytest.approx(4.5)
    assert q[("weight", 0)] == pytest.approx(2.75)
    assert q[("weight", 1)] == pytest.approx(6.25)
