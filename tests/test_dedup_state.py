"""Incremental wave-vs-corpus dedup state (VERDICT r5 item 1).

The contract under test: streaming a corpus through DedupIndex in waves
produces EXACTLY the pair set and component labels of a from-scratch
run, while each wave's compute is bounded by the delta — |wave|
signatures, a bucket-pruned scan of the persisted band table, and a
component update over affected components only (row-count gated via the
reports' Observation-backed counters)."""

import os
import shutil

import pytest

from colbert_jl_spark.config import EngineConfig

CFG = EngineConfig()
SCHEMA = "doc_id long, text string"

_WORDS = [f"tok{i}x" for i in range(30)]
_BASE = " ".join(_WORDS)


def _edit(k: int, repl: str) -> str:
    return " ".join(repl if i == k else w for i, w in enumerate(_WORDS))


_ROWS = [
    (0, _BASE),
    (1, _edit(10, "aedit")),  # wave-1-internal near-dup pair (0, 1)
    (2, "unrelated text about completely different things entirely"),
    (3, _edit(11, "bedit")),  # wave 2: near-dup of 0/1 ACROSS waves
    (4, "another singleton document with its own words"),
    (5, _BASE),               # wave 3: exact dup of 0 across waves
    (6, _edit(12, "cedit")),  # wave 3: near-dup across waves
]
_WAVES = [_ROWS[0:3], _ROWS[3:5], _ROWS[5:7]]


def _run_waves(spark, path):
    from colbert_jl_spark.streaming.dedup_state import DedupIndex

    idx = DedupIndex(path, n=3, threshold=0.7, cfg=CFG)
    reports, corpus = [], None
    for i, w in enumerate(_WAVES):
        reports.append(idx.update(spark, spark.createDataFrame(w, SCHEMA), corpus))
        corpus = spark.createDataFrame(
            [r for ww in _WAVES[: i + 1] for r in ww], SCHEMA
        )
    return idx, reports


def test_incremental_waves_equal_from_scratch(spark, tmp_path):
    """≥2 waves (3 here, with near-dup pairs inside AND across waves):
    the cumulative pair set and the final labels are identical to
    from-scratch minhash_lsh_pairs / dedup_clusters over the union."""
    from colbert_jl_spark.operators.dedup import dedup_clusters, minhash_lsh_pairs

    idx, _ = _run_waves(spark, str(tmp_path / "dedup"))
    all_docs = spark.createDataFrame(_ROWS, SCHEMA)

    want_pairs = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_pairs(all_docs, 3, 0.7, CFG).collect()
    }
    got_pairs = {
        (r.doc_a, r.doc_b, r.jaccard) for r in idx.pairs(spark).collect()
    }
    assert got_pairs == want_pairs and want_pairs  # non-trivial fixture

    want_labels = {
        r.doc_id: r.component_id
        for r in dedup_clusters(all_docs, 3, 0.7, CFG).collect()
    }
    got_labels = {
        r.doc_id: r.component_id for r in idx.labels(spark).collect()
    }
    assert got_labels == want_labels
    # the fixture exercises a real cross-wave merge: {0,1,3,5,6} one comp
    assert want_labels == {0: 0, 1: 0, 3: 0, 5: 0, 6: 0, 2: 2, 4: 4}


def test_wave_compute_is_delta_bounded(spark, tmp_path):
    """The row-count gates from the VERDICT done-criteria: each wave
    computes |wave| signatures (never the corpus), scans ONLY the
    colliding band_buckets of the persisted band table, and updates
    components over affected-components + delta nodes (never every
    corpus doc)."""
    idx, reps = _run_waves(spark, str(tmp_path / "dedup"))

    assert [r["signatures_computed"] for r in reps] == [3, 2, 2]

    # wave 2: 3 persisted docs × 16 bands = 48 rows on disk; the pruned
    # scan must read strictly fewer (only the delta's colliding buckets)
    assert reps[0]["band_rows_scanned"] == 0  # no prior corpus
    assert 0 < reps[1]["band_rows_scanned"] < 3 * 16
    assert 0 < reps[2]["band_rows_scanned"] < 5 * 16
    for r in reps[1:]:
        # the pruned scan's row count equals 16 × (persisted docs whose
        # band rows fall in the delta's buckets) — ≤ 16 per doc; the
        # strict inequality above is what proves pruning happened
        assert len(r["delta_band_buckets"]) < 64

    # wave 3 merges {5,6} into component {0,1,3}: the CC subgraph is
    # those 5 nodes, NOT all 7 corpus docs (2 and 4 are untouched)
    assert reps[2]["cc_nodes"] == 5
    assert reps[2]["n_labels"] == 7


def test_band_scan_is_partition_pruned(spark, tmp_path):
    """Plan gate: wave and band_bucket are PARTITION columns of the
    persisted band table, so the wave-vs-corpus candidate join's corpus
    scan carries non-empty PartitionFilters — at 100 TB the corpus-band
    read is bounded by colliding buckets, not the table size."""
    from pyspark.sql import functions as F

    idx, reps = _run_waves(spark, str(tmp_path / "dedup"))
    spark.catalog.clearCache()
    pruned = idx._committed(spark, "bands").where(
        F.col("band_bucket").isin(reps[2]["delta_band_buckets"][:5])
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "PartitionFilters: []" not in plan, plan


def test_orphan_wave_dirs_are_invisible(spark, tmp_path):
    """Crash safety: wave dirs not listed in state.json (a crashed
    update's leftovers — both a renamed-but-uncommitted wave dir and a
    _tmp staging dir) must be invisible to readers and harmless to the
    next update."""
    path = str(tmp_path / "dedup")
    idx, _ = _run_waves(spark, path)
    before = {(r.doc_a, r.doc_b) for r in idx.pairs(spark).collect()}

    # fake a crashed wave-99: committed-looking dir + a _tmp staging dir
    shutil.copytree(
        os.path.join(path, "pairs", "wave=1"),
        os.path.join(path, "pairs", "wave=99"),
    )
    shutil.copytree(
        os.path.join(path, "bands", "wave=1"),
        os.path.join(path, "bands", "_tmp-wave-99"),
    )
    assert {
        (r.doc_a, r.doc_b) for r in idx.pairs(spark).collect()
    } == before


def test_labels_versioned_swap_retains_current_and_previous(spark, tmp_path):
    """The labels table follows the index's versioned-swap protocol:
    after 3 waves, labels.v3 (current) and labels.v2 (previous, for
    in-flight readers) exist; labels.v1 is GC'd."""
    path = str(tmp_path / "dedup")
    _run_waves(spark, path)
    entries = sorted(e for e in os.listdir(path) if e.startswith("labels.v"))
    assert entries == ["labels.v2", "labels.v3"]


def test_mismatched_parameters_refused(spark, tmp_path):
    from colbert_jl_spark.streaming.dedup_state import DedupIndex

    path = str(tmp_path / "dedup")
    _run_waves(spark, path)
    with pytest.raises(ValueError, match="mixed parameters"):
        DedupIndex(path, n=3, threshold=0.9, cfg=CFG)
