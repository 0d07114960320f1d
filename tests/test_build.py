"""Persisted index build: round-trip, resume, validation — mirrors the
reference's save/load round-trip + completeness-check tests
(reference test/loaders_and_savers.jl:5-138,
test/indexing/collection_indexer.jl:190-258)."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from colbert_jl_spark.config import EngineConfig
from colbert_jl_spark.operators.bm25 import bm25_topk
from colbert_jl_spark.plans.build import IndexBuilder, IndexReader, _load_stages
from colbert_jl_spark.queries import queries_df


@pytest.fixture()
def index_dir(tmp_path):
    return str(tmp_path / "idx")


@pytest.mark.parametrize("fmt", ["varint", "packed", "columnar"])
def test_build_search_matches_oracle(spark, docs01, index_dir, fmt):
    # min_bucket_docs=64 → multiple doc-range buckets even at 500 docs, so
    # the persisted path exercises the multi-bucket merge; parametrized over
    # block formats because the PERSISTED path re-derives the payload
    # decoder from plan.json's config round-trip (not from the in-memory cfg)
    cfg = EngineConfig(block_size=32, min_bucket_docs=64, block_format=fmt)
    builder = IndexBuilder(index_dir, cfg)
    plan = builder.build(docs01)
    assert plan["n_docs"] == docs01.count()

    reader = IndexReader(spark, index_dir)
    report = reader.validate()
    assert report["ok"], report

    q = queries_df(spark)
    got = reader.search(q).toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    want = bm25_topk(docs01, q, cfg).toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_persisted_intersect_search(spark, docs01, index_dir):
    """IndexReader.search(mode='intersect') over the persisted index ==
    the exhaustive conjunctive referee, including the zero-df guard."""
    from colbert_jl_spark.operators.bm25 import bm25_topk_conjunctive

    cfg = EngineConfig(block_size=32, min_bucket_docs=64)
    IndexBuilder(index_dir, cfg).build(docs01)
    reader = IndexReader(spark, index_dir)
    q = [(0, "data table join"), (1, "data zzzmissingterm")]
    got = (
        reader.search(q, mode="intersect")
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    qdf = spark.createDataFrame(q, "qid long, query string")
    want = (
        bm25_topk_conjunctive(docs01, qdf, cfg)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_like=True)
    assert 1 not in set(got.qid) and 0 in set(got.qid)


def test_build_is_idempotent_and_resumable(spark, docs01, index_dir):
    cfg = EngineConfig(block_size=32)
    builder = IndexBuilder(index_dir, cfg)
    builder.build(docs01)
    stamp1 = os.path.getmtime(os.path.join(index_dir, "blocks"))
    # second build skips everything (reference indexing.jl:64-67 guard)
    builder.build(docs01)
    assert os.path.getmtime(os.path.join(index_dir, "blocks")) == stamp1

    # simulate a crash after "dictionary": drop blocks+lineage stage marks
    stages = _load_stages(index_dir)
    for s in ("blocks", "lineage"):
        stages.pop(s)
        shutil.rmtree(os.path.join(index_dir, s), ignore_errors=True)
    with open(os.path.join(index_dir, "_STAGES.json"), "w") as f:
        json.dump(stages, f)
    stamp_dict = os.path.getmtime(os.path.join(index_dir, "dictionary"))
    builder.build(docs01)  # resumes: rebuilds only blocks + lineage
    assert os.path.getmtime(os.path.join(index_dir, "dictionary")) == stamp_dict
    reader = IndexReader(spark, index_dir)
    assert reader.validate()["ok"]


def test_sink_is_injectable(spark, docs01, index_dir):
    """Stage commit/resume semantics must not depend on the tmp→rename
    trick: a fake sink (direct parquet write, no rename; an Iceberg
    ``writeTo`` would slot in the same way) produces a valid, resumable,
    searchable index through the identical staged protocol."""
    calls = []

    def fake_sink(df, final_dir, partition_by=None):
        calls.append((os.path.basename(final_dir), partition_by))
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(final_dir)

    cfg = EngineConfig(block_size=32)
    builder = IndexBuilder(index_dir, cfg, sink=fake_sink)
    builder.build(docs01)
    assert [c[0] for c in calls] == ["postings", "docstats", "dictionary", "blocks", "lineage"]
    assert dict(calls)["blocks"] == "term_bucket"
    # r4: the dictionary shares the block table's term_bucket partitioning
    assert dict(calls)["dictionary"] == "term_bucket"

    reader = IndexReader(spark, index_dir)
    assert reader.validate()["ok"]
    assert reader.search(queries_df(spark)).count() > 0

    # resume goes through the SAME seam: only the dropped stage re-commits
    stages = _load_stages(index_dir)
    stages.pop("lineage")
    with open(os.path.join(index_dir, "_STAGES.json"), "w") as f:
        json.dump(stages, f)
    calls.clear()
    builder.build(docs01)
    assert [c[0] for c in calls] == ["lineage"]


def test_search_local_matches_distributed(spark, docs01, index_dir):
    """The driver-side latency mode (one pruned collect, zero shuffles)
    must be row-identical to the distributed executor in both modes, on a
    multi-bucket index (so the driver-side k·buckets merge is exercised)."""
    import pandas as pd

    cfg = EngineConfig(block_size=32, min_bucket_docs=64)
    IndexBuilder(index_dir, cfg).build(docs01)
    reader = IndexReader(spark, index_dir)
    q = queries_df(spark)
    key = ["qid", "rank"]
    got = reader.search_local(q).toPandas().sort_values(key).reset_index(drop=True)
    want = reader.search(q).toPandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_like=True)

    qi = [(0, "data table join"), (1, "data zzzmissingterm"), (2, "the of")]
    got_i = (
        reader.search_local(qi, mode="intersect")
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    want_i = (
        reader.search(qi, mode="intersect")
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_i, want_i, check_like=True)


def test_search_local_size_guard_falls_back(spark, docs01, index_dir):
    """VERDICT r3 item 5: search_local must estimate the pruned collect
    volume from the query terms' df (driver-side dictionary lookup) and
    route head-term queries through the distributed search() instead of
    collecting their block slice into the driver — with identical output."""
    import pandas as pd

    cfg = EngineConfig(block_size=32, min_bucket_docs=64)
    IndexBuilder(index_dir, cfg).build(docs01)
    q = [(5, "data")]  # head term: df ≈ half the fixture corpus

    reader = IndexReader(spark, index_dir)
    key = ["qid", "rank"]
    want = reader.search(q).toPandas().sort_values(key).reset_index(drop=True)

    reader.max_local_postings = 1  # any real term exceeds this
    routed = []
    orig = reader.search
    reader.search = lambda *a, **kw: (routed.append(1), orig(*a, **kw))[1]
    got = reader.search_local(q).toPandas().sort_values(key).reset_index(drop=True)
    assert routed, "size guard must fall back to distributed search()"
    pd.testing.assert_frame_equal(got, want, check_like=True)

    # under the threshold the driver-side path runs WITHOUT search() —
    # and repeat queries reuse the cached term stats (no growth in cache)
    reader2 = IndexReader(spark, index_dir)
    reader2.search = lambda *a, **kw: pytest.fail("must not fall back")
    got2 = reader2.search_local(q).toPandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, want, check_like=True)
    n_cached = len(reader2._term_stats)
    reader2.search_local(q).collect()
    assert len(reader2._term_stats) == n_cached


def test_sink_crash_mid_stage_then_resume(spark, docs01, index_dir):
    """Kill/resume at stage granularity through the injected sink
    (VERDICT r2 item 7): a sink that dies mid-commit on the blocks stage
    must leave the ledger WITHOUT a blocks mark (the commit never
    happened), and the resumed build must re-drive ONLY the unfinished
    stages through the same seam, ending rank-identical to the oracle."""
    import pandas as pd

    crashes = {"blocks": 1}  # fail the first blocks commit
    calls = []

    def flaky_sink(df, final_dir, partition_by=None):
        name = os.path.basename(final_dir)
        calls.append(name)
        if crashes.get(name, 0) > 0:
            crashes[name] -= 1
            # simulate a mid-commit kill: some files may exist, but the
            # transactional rename/snapshot-commit never happened
            w = df.limit(1).write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(partition_by)
            w.parquet(final_dir + ".tmp")
            raise RuntimeError("sink died mid-commit")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(final_dir)

    cfg = EngineConfig(block_size=32)
    builder = IndexBuilder(index_dir, cfg, sink=flaky_sink)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="sink died"):
        builder.build(docs01)
    stages = _load_stages(index_dir)
    assert {"postings", "plan", "dictionary"} <= set(stages)
    assert "blocks" not in stages and "lineage" not in stages

    calls.clear()
    builder.build(docs01)  # resume
    # only the unfinished stages re-commit — completed ones are never redone
    assert calls == ["blocks", "lineage"], calls
    reader = IndexReader(spark, index_dir)
    assert reader.validate()["ok"]
    q = queries_df(spark)
    got = reader.search(q).toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    want = (
        bm25_topk(docs01, q, cfg)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_lineage_metrics(spark, docs01, index_dir):
    cfg = EngineConfig(block_size=32)
    IndexBuilder(index_dir, cfg).build(docs01)
    reader = IndexReader(spark, index_dir)
    lin = reader.lineage.toPandas()
    # north-rule lineage: per-partition postings emitted + bytes compressed
    assert {"bucket", "postings_emitted", "blocks_written", "bytes_compressed", "terms_seen"} <= set(lin.columns)
    assert (lin["bytes_compressed"] > 0).all()
    total_postings = int(lin["postings_emitted"].sum())
    assert total_postings == reader.dictionary.toPandas()["df"].sum()


def test_blocks_stage_shuffle_sizing_restores_conf(spark, docs01, index_dir):
    """The blocks stage sizes spark.sql.shuffle.partitions to the posting
    volume (spill-awareness at 100 TB) and must restore the session value
    afterwards; at fixture scale (<4M postings) the floor is the session
    default, so the build plan is unchanged."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        IndexBuilder(index_dir, EngineConfig(block_size=32)).build(docs01, force=True)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
        assert IndexReader(spark, index_dir).validate()["ok"]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_validate_detects_missing_stage(spark, docs01, index_dir):
    cfg = EngineConfig(block_size=32)
    IndexBuilder(index_dir, cfg).build(docs01)
    stages = _load_stages(index_dir)
    stages.pop("lineage")
    with open(os.path.join(index_dir, "_STAGES.json"), "w") as f:
        json.dump(stages, f)
    report = IndexReader(spark, index_dir).validate()
    assert not report["ok"]
    assert report["missing_stages"] == ["lineage"]


def test_validate_flags_fragmented_stage(spark, docs01, index_dir, tmp_path):
    """VERDICT r5 item 5: the per-term_bucket small-file ceiling the
    compaction passes maintain must be checked at SERVE time too — a
    long-lived streamed index whose compaction never ran drifts into
    per-file open cost on every scan, and validate() is where an operator
    looks. Hand-fragment one bucket (identical rows, many part files) and
    validate() must flag exactly the fragmentation invariant."""
    cfg = EngineConfig(block_size=32)
    IndexBuilder(index_dir, cfg).build(docs01)
    reader = IndexReader(spark, index_dir)
    rep = reader.validate()
    assert rep["ok"] and rep["fragmentation_ok"], rep
    assert rep["blocks_files_per_bucket_max"] <= rep["max_files_per_bucket"]

    # rewrite the fullest bucket's single file as 12 tiny files with the
    # SAME rows: every other invariant (posting sums, doc counts) holds,
    # so any failure is attributable to fragmentation alone
    bdir = reader._stage_dir("blocks_dir", "blocks")
    counts = reader._bucket_file_counts(bdir)
    bucket = max(counts, key=counts.get)
    sub = os.path.join(bdir, f"term_bucket={bucket}")
    frag = str(tmp_path / "frag")
    spark.read.parquet(sub).repartition(12).write.parquet(frag)
    for f in os.listdir(sub):
        if f.startswith("part-"):
            os.remove(os.path.join(sub, f))
    for f in os.listdir(frag):
        if f.startswith("part-") and f.endswith(".parquet"):
            shutil.copy(os.path.join(frag, f), os.path.join(sub, f))

    rep2 = IndexReader(spark, index_dir).validate()
    assert not rep2["fragmentation_ok"] and not rep2["ok"], rep2
    assert rep2["blocks_files_per_bucket_max"] > rep2["max_files_per_bucket"]
    # posting sums still match — fragmentation is the only broken invariant
    assert rep2["postings_match"] and rep2["n_docs_match"]
    # the ceiling is an explicit policy knob: widening it restores ok
    assert IndexReader(spark, index_dir).validate(max_files_per_bucket=20)["ok"]


def test_stage_scan_survives_version_gc_race(spark, docs001, tmp_path):
    """ADVICE r4: a reader that validated its plan snapshot and then
    paused while compactions GC'd its stage-dir version must get ONE
    transparent refresh-and-retry at scan construction instead of a raw
    missing-path error. Simulated by renaming the blocks dir to a new
    version + repointing plan.json AFTER the reader's refresh()."""
    import json as _json
    import shutil as _shutil

    import pandas as pd

    cfg = EngineConfig(block_size=32)
    idx = str(tmp_path / "idx")
    IndexBuilder(idx, cfg).build(docs001)
    reader = IndexReader(spark, idx)
    want = reader.search([(0, "spark table join")]).toPandas()
    reader.refresh()  # snapshot validated here...

    # ...then a compaction commits a new version and GC removes the old
    _shutil.move(os.path.join(idx, "blocks"), os.path.join(idx, "blocks.v2"))
    with open(os.path.join(idx, "plan.json")) as f:
        plan = _json.load(f)
    plan["blocks_dir"] = "blocks.v2"
    from colbert_jl_spark.plans.build import write_plan

    write_plan(idx, plan)

    # the stale-plan scan path resolves through _stage_df's retry
    got = reader.search([(0, "spark table join")]).toPandas()
    pd.testing.assert_frame_equal(got, want, check_like=True)
