"""Streaming ingest: file-arrival micro-batches → postings append →
compaction → rank-identical search vs the batch-built index; plus the
watermarked windowed aggregation over events."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from colbert_jl_spark.config import EngineConfig
from colbert_jl_spark.operators.bm25 import bm25_topk
from colbert_jl_spark.plans.build import IndexReader
from colbert_jl_spark.queries import queries_df
from colbert_jl_spark.sources.pages import pages_from_documents
from colbert_jl_spark.streaming.ingest import (
    compact_streamed_index,
    minor_compact,
    stream_pages_to_postings,
    windowed_event_counts,
)
from tests.conftest import SF001


def test_stream_ingest_compact_search(spark, docs001, tmp_path):
    cfg = EngineConfig(block_size=32)
    pages_dir = str(tmp_path / "pages_in")
    idx = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt")

    # simulate arrival in 3 waves (3 parquet files → ≥1 micro-batches)
    pages = pages_from_documents(docs001)
    for i in range(3):
        wave = pages.where(F.crc32(F.col("url")) % 3 == i)
        wave.write.mode("append").parquet(pages_dir)

    stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg)
    log = spark.read.parquet(os.path.join(idx, "ingest_log"))
    assert log.agg(F.sum("n_docs")).first()[0] == docs001.count()

    plan = compact_streamed_index(spark, idx, cfg)
    assert plan["n_docs"] == docs001.count()

    reader = IndexReader(spark, idx)
    assert reader.validate()["ok"]
    got = (
        reader.search(queries_df(spark))
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    want = (
        bm25_topk(docs001, queries_df(spark), cfg)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_incremental_compaction_touches_only_new_postings(spark, docs01, tmp_path):
    """VERDICT r2 item 2: after the initial compaction, compacting a new
    ingest wave must (a) read ONLY the new wave's postings, (b) leave every
    pre-existing block file byte-untouched (pure delta append), and (c)
    yield an index whose search output is rank-identical to a from-scratch
    batch build over the full corpus — including fresh idf (N doubled) and
    avgdl drift, and with wave-2 doc_ids INTERLEAVING wave-1's (the
    overlap-segment cursor path)."""
    cfg = EngineConfig(block_size=32, min_bucket_docs=64)
    pages_dir = str(tmp_path / "pages_in")
    idx = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt")

    pages = pages_from_documents(docs01)
    w1 = pages.where(F.crc32(F.col("url")) % 2 == 0)
    w2 = pages.where(F.crc32(F.col("url")) % 2 == 1)

    # ---- wave 1: ingest + initial (full) compaction ----------------------
    w1.write.mode("append").parquet(pages_dir)
    stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg)
    r1 = compact_streamed_index(spark, idx, cfg)
    assert r1["compaction"]["mode"] == "full"
    assert IndexReader(spark, idx).validate()["ok"]

    # a reader constructed (and warmed, incl. its term-stats cache) BEFORE
    # the next compaction — must transparently refresh (ADVICE r4)
    stale_reader = IndexReader(spark, idx).load_hot()
    stale_reader.search(queries_df(spark)).collect()
    stale_reader.search_local([(0, "spark table join")]).collect()

    def block_files():
        out = {}
        for root, _, files in os.walk(os.path.join(idx, "blocks")):
            for f in files:
                if f.startswith("part-"):
                    p = os.path.join(root, f)
                    out[p] = (os.path.getmtime(p), os.path.getsize(p))
        return out

    old_files = block_files()

    # ---- wave 2: ingest + INCREMENTAL compaction --------------------------
    w2.write.mode("append").parquet(pages_dir)
    stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg)
    wave2_batches = [
        d for d in os.listdir(os.path.join(idx, "postings"))
        if d.startswith("batch=") and int(d.split("=")[1]) > max(
            r1["compaction"]["batches_compacted"]
        )
    ]
    wave2_postings = spark.read.parquet(
        *[os.path.join(idx, "postings", d) for d in wave2_batches]
    ).count()

    r2 = compact_streamed_index(spark, idx, cfg)
    assert r2["compaction"]["mode"] == "incremental"
    # (a) the job read exactly the new wave's postings, nothing more
    assert r2["compaction"]["postings_read"] == wave2_postings
    assert r2["compaction"]["docs_added"] == w2.count()
    # (b) pure delta append: every pre-existing block file untouched
    new_files = block_files()
    for p, sig in old_files.items():
        assert p in new_files and new_files[p] == sig, f"rewritten: {p}"
    assert len(new_files) > len(old_files)
    # plan carries the freshness marker the reader needs
    assert r2["incremental"]["epochs"] == 2
    assert r2["n_docs"] == docs01.count()

    # (c) rank-identical to a from-scratch batch build over ALL docs
    reader = IndexReader(spark, idx)
    assert reader.validate()["ok"], reader.validate()
    got = (
        reader.search(queries_df(spark))
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    want = (
        bm25_topk(docs01, queries_df(spark), cfg)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_like=True)

    # the driver-side latency mode applies the SAME idf/avgdl freshness
    got_local = (
        reader.search_local(queries_df(spark))
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_local, want, check_like=True)

    # the dictionary merge committed as a VERSIONED dir and plan repointed
    assert r2["dictionary_dir"] == "dictionary.v2"
    assert os.path.isdir(os.path.join(idx, "dictionary.v2"))

    # the PRE-compaction reader serves the post-compaction truth on BOTH
    # paths: its plan snapshot, fused-path gate, hot block cache and
    # term-stats cache all refresh off the plan.json mtime (ADVICE r4 —
    # a stale reader here returns stale-idf scores or duplicate ranks)
    got_stale = (
        stale_reader.search(queries_df(spark))
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_stale, want, check_like=True)
    got_stale_local = (
        stale_reader.search_local(queries_df(spark))
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_stale_local, want, check_like=True)
    # retire the hot reader BEFORE the major compaction below: an
    # undisposed pin would be plan-matched into other readers' scans of
    # the rewritten block dir (see IndexReader.release docstring)
    stale_reader.release()

    # conjunctive mode rides the same freshness overlay
    from colbert_jl_spark.operators.bm25 import bm25_topk_conjunctive

    q = [(0, "data table join"), (1, "data zzzmissingterm")]
    got_i = (
        reader.search(q, mode="intersect")
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    want_i = (
        bm25_topk_conjunctive(
            docs01, spark.createDataFrame(q, "qid long, query string"), cfg
        )
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_i, want_i, check_like=True)

    # a third call with nothing new is a no-op
    r3 = compact_streamed_index(spark, idx, cfg)
    assert r3["compaction"]["mode"] == "noop"

    # and a MAJOR compaction (full=True) resets epochs + stays identical,
    # clearing every versioned dictionary dir back to the canonical one
    r4 = compact_streamed_index(spark, idx, cfg, full=True)
    assert r4["compaction"]["mode"] == "full"
    assert "incremental" not in r4
    assert "dictionary_dir" not in r4
    assert not [d for d in os.listdir(idx) if d.startswith("dictionary.v")]
    reader2 = IndexReader(spark, idx)
    got2 = (
        reader2.search(queries_df(spark))
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got2, want, check_like=True)


def test_incremental_dictionary_rewrites_only_delta_buckets(
    spark, docs01, tmp_path
):
    """VERDICT r3 item 4: an incremental compaction must rewrite ONLY the
    dictionary term_bucket partitions containing delta terms. With an
    explicit 256-way term fan-out and a ~10-doc delta wave, most buckets
    hold no delta term — their files must ride into the new dictionary
    version as HARDLINKS (same inode ⇒ byte-identical), while exactly the
    delta terms' buckets are rewritten. Search correctness after the merge
    is covered by the rank-identity tests; this gates the I/O shape."""
    from colbert_jl_spark.functions.hashing import spark_pmod_hash
    from colbert_jl_spark.functions.tokenizer import py_terms

    cfg = EngineConfig(block_size=32, min_bucket_docs=64, term_partitions=256)
    pages_dir = str(tmp_path / "pages_in")
    idx = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt")

    pages = pages_from_documents(docs01)
    w1 = pages.where(F.crc32(F.col("url")) % 50 != 0)
    w2 = pages.where(F.crc32(F.col("url")) % 50 == 0)
    assert 0 < w2.count() < 25

    w1.write.mode("append").parquet(pages_dir)
    stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg)
    r1 = compact_streamed_index(spark, idx, cfg)
    assert r1["term_partitions"] == 256

    def bucket_inodes(dic_dir):
        out = {}
        for entry in os.listdir(dic_dir):
            if entry.startswith("term_bucket="):
                b = int(entry.split("=", 1)[1])
                d = os.path.join(dic_dir, entry)
                out[b] = {
                    f: os.stat(os.path.join(d, f)).st_ino
                    for f in os.listdir(d)
                    if f.startswith("part-")
                }
        return out

    old = bucket_inodes(os.path.join(idx, "dictionary"))

    w2.write.mode("append").parquet(pages_dir)
    stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg)
    r2 = compact_streamed_index(spark, idx, cfg)
    assert r2["compaction"]["mode"] == "incremental"

    # expected affected buckets, computed independently with the python
    # tokenizer + hash clone over the delta wave's text
    delta_terms = set()
    for r in w2.select("text").collect():
        delta_terms.update(py_terms(r.text, cfg.doc_maxlen, cfg.stopwords))
    affected = {spark_pmod_hash(t, 256) for t in delta_terms}
    assert affected and len(affected) < len(old), (
        "fixture must leave untouched buckets"
    )

    new = bucket_inodes(os.path.join(idx, r2["dictionary_dir"]))
    for b, files in old.items():
        if b in affected:
            # rewritten: no file may be a hardlink of the old version
            assert not set(new[b].values()) & set(files.values()), (
                f"delta bucket {b} was not rewritten"
            )
        else:
            assert new[b] == files, f"untouched bucket {b} was rewritten"
    # delta may open brand-new buckets; every affected bucket exists
    assert affected <= set(new)

    # merged dictionary is complete: Σdf == total postings on disk
    reader = IndexReader(spark, idx)
    assert reader.validate()["ok"], reader.validate()


def test_incremental_compaction_three_epochs_avgdl_growth(spark, docs01, tmp_path):
    """Three ingest waves ordered by document length — every epoch RAISES
    avgdl, so pre-existing blocks' encode-time tf_norm bounds UNDERestimate
    under the new avgdl and rank identity depends on the bound_scale
    widening (max(1, avgdl_now/min_enc_avgdl)); with two incremental
    epochs the min-over-epochs bookkeeping is exercised too. An
    over-pruning bug shows up here as a missing/reordered top-k row."""
    from pyspark.sql import Window

    cfg = EngineConfig(block_size=32, min_bucket_docs=64)
    pages_dir = str(tmp_path / "pages_in")
    idx = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt")

    ranked = docs01.withColumn(
        "third",
        F.ntile(3).over(Window.orderBy(F.length("text"), "doc_id")),
    )
    plans = []
    for wave in (1, 2, 3):
        w = pages_from_documents(
            ranked.where(F.col("third") == wave).drop("third")
        )
        w.write.mode("append").parquet(pages_dir)
        stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg)
        plans.append(compact_streamed_index(spark, idx, cfg))

    assert plans[0]["compaction"]["mode"] == "full"
    assert [p["compaction"]["mode"] for p in plans[1:]] == ["incremental"] * 2
    # avgdl grew every epoch → min_enc_avgdl pins the FIRST epoch's value
    assert plans[1]["avgdl"] > plans[0]["avgdl"]
    assert plans[2]["avgdl"] > plans[1]["avgdl"]
    assert plans[2]["incremental"]["epochs"] == 3
    assert plans[2]["incremental"]["min_enc_avgdl"] == min(
        p["avgdl"] for p in plans
    )

    reader = IndexReader(spark, idx)
    assert reader.validate()["ok"]
    got = (
        reader.search(queries_df(spark))
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    want = (
        bm25_topk(docs01, queries_df(spark), cfg)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_minor_compaction_restores_segment_disjointness(spark, docs01, tmp_path):
    """VERDICT r3 item 2: after interleaved incremental epochs, minor
    compaction must rewrite ONLY the term_buckets containing range-
    overlapping (term, bucket) segment groups, restore the disjointness
    invariant the lazy WAND cursor path requires (the cursor merges
    eagerly iff ranges overlap — disjointness IS the lazy-path assertion),
    carry every other term_bucket partition into the new blocks version
    as hardlinks (inode-identical ⇒ byte-identical), and preserve rank
    identity vs the from-scratch oracle."""
    import json as _json

    cfg = EngineConfig(block_size=32, min_bucket_docs=64)
    pages_dir = str(tmp_path / "pages_in")
    idx = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt")

    pages = pages_from_documents(docs01)
    for i, pred in enumerate(
        (F.crc32(F.col("url")) % 2 == 0, F.crc32(F.col("url")) % 2 == 1)
    ):
        pages.where(pred).write.mode("append").parquet(pages_dir)
        stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg)
        compact_streamed_index(spark, idx, cfg)

    def blocks_dir():
        plan = _json.load(open(os.path.join(idx, "plan.json")))
        return os.path.join(idx, plan.get("blocks_dir", "blocks"))

    def segment_ranges():
        return (
            spark.read.parquet(blocks_dir())
            .select("term", "bucket", "term_bucket", "first_docid", "last_docid")
            .toPandas()
        )

    def overlapping_groups(bl):
        bad = set()
        for (t, b), g in bl.groupby(["term", "bucket"]):
            g = g.sort_values(["first_docid", "last_docid"])
            if (
                g["first_docid"].iloc[1:].values
                <= g["last_docid"].iloc[:-1].values
            ).any():
                bad.add((t, b))
        return bad

    before = segment_ranges()
    bad = overlapping_groups(before)
    assert bad, "interleaved fixture must create overlapping segments"

    def bucket_sigs():
        out = {}
        root = blocks_dir()
        for entry in os.listdir(root):
            if entry.startswith("term_bucket="):
                d = os.path.join(root, entry)
                out[int(entry.split("=", 1)[1])] = {
                    f: (os.stat(os.path.join(d, f)).st_ino,
                        os.path.getsize(os.path.join(d, f)))
                    for f in os.listdir(d) if f.startswith("part-")
                }
        return out

    sig_before = bucket_sigs()
    dir_before = blocks_dir()
    rep = minor_compact(spark, idx)
    assert rep["mode"] == "minor"
    # committed as a NEW version + plan repoint; previous version retained
    assert blocks_dir() != dir_before
    assert os.path.isdir(dir_before)
    assert rep["groups"] == len(bad)
    expect_tbs = set(
        before.set_index(["term", "bucket"])
        .loc[list(bad)]["term_bucket"].unique().tolist()
    )
    assert set(rep["rewritten_term_buckets"]) == expect_tbs

    # disjointness restored EVERYWHERE → the cursor takes the lazy path
    after = segment_ranges()
    assert not overlapping_groups(after)
    # postings conserved (pure re-blocking, nothing lost or duplicated)
    bl = spark.read.parquet(blocks_dir())
    assert (
        bl.agg(F.sum("n_docs")).first()[0]
        == spark.read.parquet(os.path.join(idx, "postings")).count()
    )

    # untouched term_buckets byte-identical
    sig_after = bucket_sigs()
    for tb, files in sig_before.items():
        if tb not in rep["rewritten_term_buckets"]:
            assert sig_after[tb] == files, f"untouched bucket {tb} rewritten"

    # rank identity vs the from-scratch oracle, both executors
    reader = IndexReader(spark, idx)
    got = (
        reader.search(queries_df(spark))
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    want = (
        bm25_topk(docs01, queries_df(spark), cfg)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_like=True)

    # idempotent: a second pass finds nothing to do
    assert minor_compact(spark, idx)["mode"] == "noop"

    # and further incremental epochs still work after a minor pass
    assert compact_streamed_index(spark, idx, cfg)["compaction"]["mode"] == "noop"


def test_crashed_incremental_compaction_recovers_via_full_rebuild(
    spark, docs01, tmp_path
):
    """A compaction killed mid-delta-write must not poison the index: the
    in_progress write-ahead marker routes the next compaction through a
    major (full) rebuild, which replaces every derived table wholesale —
    duplicated partial deltas can't survive. Simulated by injecting a
    failure after the docstats append (the first in-place delta write)."""
    import json

    from unittest import mock

    cfg = EngineConfig(block_size=32, min_bucket_docs=64)
    pages_dir = str(tmp_path / "pages_in")
    idx = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt")

    pages = pages_from_documents(docs01)
    w1 = pages.where(F.crc32(F.col("url")) % 2 == 0)
    w2 = pages.where(F.crc32(F.col("url")) % 2 == 1)
    w1.write.mode("append").parquet(pages_dir)
    stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg)
    compact_streamed_index(spark, idx, cfg)

    w2.write.mode("append").parquet(pages_dir)
    stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg)
    # die right after the first in-place delta write (docstats append):
    # term_df is the next call in the incremental path
    import colbert_jl_spark.operators.postings as postings_mod

    with mock.patch.object(
        postings_mod, "term_df",
        side_effect=RuntimeError("killed mid-compaction"),
    ):
        with pytest.raises(RuntimeError, match="killed mid-compaction"):
            compact_streamed_index(spark, idx, cfg)

    state = json.load(open(os.path.join(idx, "_COMPACT.json")))
    assert state.get("in_progress"), "write-ahead marker must survive the crash"
    # docstats already holds the (partial) delta — a naive incremental
    # retry would append it AGAIN; the marker must force a full rebuild
    r = compact_streamed_index(spark, idx, cfg)
    assert r["compaction"]["mode"] == "full"
    reader = IndexReader(spark, idx)
    assert reader.validate()["ok"], reader.validate()
    got = (
        reader.search(queries_df(spark))
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    want = (
        bm25_topk(docs01, queries_df(spark), cfg)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_like=True)
    # and the recovered state supports further incremental compactions
    assert not json.load(open(os.path.join(idx, "_COMPACT.json"))).get("in_progress")


def test_compaction_invalidates_stale_positions(spark, docs001, tmp_path):
    """The optional positional stage derives from the raw token stream,
    which a compaction cannot reconstruct — so ingesting new documents
    must DROP it (stage marker + plan key + dir) and make phrase() fail
    loudly with the rebuild instruction, never silently serve phrase
    results that miss the new docs."""
    from colbert_jl_spark.operators.phrase import phrase_matches
    from colbert_jl_spark.plans.build import IndexBuilder, IndexReader
    from colbert_jl_spark.sources.pages import docs_from_pages

    cfg = EngineConfig(block_size=32)
    pages_dir = str(tmp_path / "pages_in")
    idx = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt")

    pages = pages_from_documents(docs001)
    w1 = pages.where(F.crc32(F.col("url")) % 2 == 0)
    w2 = pages.where(F.crc32(F.col("url")) % 2 == 1)

    w1.write.mode("append").parquet(pages_dir)
    stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg)
    compact_streamed_index(spark, idx, cfg)

    builder = IndexBuilder(idx, cfg)
    builder.build_positions(docs_from_pages(w1))
    reader = IndexReader(spark, idx)
    phrases = [(0, "data table")]
    served_w1 = reader.phrase(phrases).count()

    w2.write.mode("append").parquet(pages_dir)
    stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg)
    compact_streamed_index(spark, idx, cfg)

    # the SAME reader (refresh) and a fresh one both refuse stale service
    for r in (reader, IndexReader(spark, idx)):
        with pytest.raises(RuntimeError, match="positions stage"):
            r.phrase(phrases)
    assert not os.path.exists(os.path.join(idx, "positions"))

    # rebuilding over the full corpus restores exact service
    builder.build_positions(docs001)
    got = {
        (r.pid, r.doc_id): r.n_occurrences
        for r in IndexReader(spark, idx).phrase(phrases).collect()
    }
    want = {
        (r.pid, r.doc_id): r.n_occurrences
        for r in phrase_matches(docs001, phrases, cfg).collect()
    }
    assert got == want and len(got) >= served_w1


def test_streamed_positions_survive_compactions(spark, docs001, tmp_path):
    """With positions=True the ingest captures per-batch RAW positional
    postings, and the compactor MAINTAINS the positions stage instead of
    invalidating it: the initial full compaction builds it from the raw
    captures, an incremental epoch appends only the delta's rows, and a
    major compaction rebuilds it — phrase queries stay exact on streamed
    indexes at every step."""
    from colbert_jl_spark.operators.phrase import phrase_matches
    from colbert_jl_spark.plans.build import IndexReader
    from colbert_jl_spark.sources.pages import docs_from_pages

    cfg = EngineConfig(block_size=32)
    pages_dir = str(tmp_path / "pages_in")
    idx = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt")
    phrases = [(0, "data table"), (1, "the data"), (2, "zzzmissing phrase")]

    def served():
        return {
            (r.pid, r.doc_id): r.n_occurrences
            for r in IndexReader(spark, idx).phrase(phrases).collect()
        }

    def inline(docs):
        return {
            (r.pid, r.doc_id): r.n_occurrences
            for r in phrase_matches(docs, phrases, cfg).collect()
        }

    pages = pages_from_documents(docs001)
    w1 = pages.where(F.crc32(F.col("url")) % 2 == 0)
    w2 = pages.where(F.crc32(F.col("url")) % 2 == 1)

    w1.write.mode("append").parquet(pages_dir)
    stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg, positions=True)
    plan1 = compact_streamed_index(spark, idx, cfg)
    assert plan1.get("positions") is True
    assert served() == inline(docs_from_pages(w1))

    w2.write.mode("append").parquet(pages_dir)
    stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg, positions=True)
    plan2 = compact_streamed_index(spark, idx, cfg)
    assert plan2["compaction"]["mode"] == "incremental"
    assert plan2.get("positions") is True
    full_truth = inline(docs001)
    assert served() == full_truth
    assert full_truth  # fixture phrases must match something

    # and across a major compaction (stage dropped + rebuilt from raw)
    compact_streamed_index(spark, idx, cfg, full=True)
    assert served() == full_truth


def test_stream_resume_is_idempotent(spark, docs001, tmp_path):
    """Re-running the stream over the same checkpoint ingests nothing new
    (exactly-once at batch granularity)."""
    cfg = EngineConfig(block_size=32)
    pages_dir = str(tmp_path / "pages_in")
    idx = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt")
    pages_from_documents(docs001).write.parquet(pages_dir)

    stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg)
    n1 = spark.read.parquet(os.path.join(idx, "postings")).count()
    stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg)  # replay
    n2 = spark.read.parquet(os.path.join(idx, "postings")).count()
    assert n1 == n2


def test_windowed_event_counts(spark, tmp_path):
    """availableNow run over the events table as a file stream; result
    must equal the equivalent batch windowed aggregation."""
    events_dir = str(tmp_path / "events_in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt_ev")
    batch = spark.read.parquet(f"{SF001}/events.parquet")
    batch.write.parquet(events_dir)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream = spark.readStream.schema(schema).parquet(events_dir)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir).toPandas()
    # append mode only emits windows the final watermark has passed:
    # window_end <= max(ts) - 10 min. Later windows are correctly withheld
    # (they could still receive late data in a live stream).
    max_ts = batch.agg(F.max("ts")).first()[0]
    want = (
        batch.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "sum_value",
        )
        .where(F.col("window_end") <= F.lit(max_ts) - F.expr("INTERVAL 10 MINUTES"))
        .toPandas()
    )
    assert len(got) > 0
    key = ["window_start", "window_end", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)[want.columns]
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_incremental_collision_probe_is_delta_scoped(spark, tmp_path):
    """VERDICT r4 item 2: an incremental epoch must never run a
    vocab-scale aggregate — the tid collision probe and the encoder's
    dictionary join see only the DELTA vocabulary, read through a
    bucket-pruned scan of the merged dictionary. Big-vocab fixture
    (per-doc unique terms, the web tail shape): the report's probe_terms
    must equal the delta's vocabulary, not the corpus's, and the
    _delta_dictionary view's physical plan must carry the term_bucket
    partition filter."""
    from colbert_jl_spark.functions.tokenizer import py_terms
    from colbert_jl_spark.streaming.ingest import _delta_dictionary

    cfg = EngineConfig(block_size=32, min_bucket_docs=64, term_partitions=64)
    pages_dir = str(tmp_path / "pages_in")
    idx = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt")

    w1 = spark.createDataFrame(
        [(i, " ".join(f"t{i}w{j}" for j in range(8)), "en") for i in range(300)],
        "doc_id long, text string, lang string",
    )
    w2 = spark.createDataFrame(
        [(1000 + i, f"t{1000+i}w0 shared0 shared1", "en") for i in range(5)],
        "doc_id long, text string, lang string",
    )
    pages_from_documents(w1).write.mode("append").parquet(pages_dir)
    stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg)
    compact_streamed_index(spark, idx, cfg)

    pages_from_documents(w2).write.mode("append").parquet(pages_dir)
    stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg)
    r2 = compact_streamed_index(spark, idx, cfg)
    rep = r2["compaction"]
    assert rep["mode"] == "incremental"

    delta_vocab = set()
    for r in w2.select("text").collect():
        delta_vocab.update(py_terms(r.text, cfg.doc_maxlen, cfg.stopwords))
    full_vocab = 300 * 8 + len(delta_vocab)  # ≥2400 distinct corpus terms
    assert rep["probe_terms"] == len(delta_vocab) == 7
    assert rep["probe_terms"] < full_vocab / 100
    assert 0 < rep["probe_buckets"] <= len(delta_vocab) < 64
    assert rep["dictionary_merge"]["mode"] == "bucket-local"

    # the delta view's scan is PARTITION-pruned, not just row-filtered
    reader = IndexReader(spark, idx)
    view = _delta_dictionary(
        reader.dictionary,
        spark.createDataFrame([("shared0",)], "term string"),
        {3, 7},
    )
    plan = view._jdf.queryExecution().executedPlan().toString()
    scan = plan.split("PartitionFilters", 1)
    assert len(scan) == 2 and "term_bucket" in scan[1][:300], plan

    # and the merged index still answers exactly
    assert reader.validate()["ok"]
    hits = reader.search([(0, "shared0 shared1")]).collect()
    assert {r.doc_id for r in hits} == {1000 + i for i in range(5)}


def test_head_heavy_delta_falls_back_to_full_merge(spark, docs001, tmp_path):
    """VERDICT r4 item 5: when a delta's vocabulary touches most
    term_bucket partitions (coupon collector — the 29-term fixture vocab
    over 8 buckets), the bucket-local hardlink assembly does strictly
    more work than a plain full merge — the merge must fall back to the
    direct full rewrite, still committed as a reader-safe versioned dir,
    with the chosen mode + threshold recorded in the compaction report."""
    cfg = EngineConfig(block_size=32, term_partitions=8)
    pages_dir = str(tmp_path / "pages_in")
    idx = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt")

    pages = pages_from_documents(docs001)
    w1 = pages.where(F.crc32(F.col("url")) % 4 != 0)
    w2 = pages.where(F.crc32(F.col("url")) % 4 == 0)

    w1.write.mode("append").parquet(pages_dir)
    stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg)
    compact_streamed_index(spark, idx, cfg)

    w2.write.mode("append").parquet(pages_dir)
    stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg)
    r2 = compact_streamed_index(spark, idx, cfg)
    merge = r2["compaction"]["dictionary_merge"]
    assert merge["mode"] == "full-rewrite"
    assert merge["affected_buckets"] > merge["head_heavy_threshold"] * 8
    assert r2["dictionary_dir"] == "dictionary.v2"
    assert os.path.isdir(os.path.join(idx, "dictionary.v2"))

    # rank identity vs the from-scratch oracle survives the fallback path
    reader = IndexReader(spark, idx)
    assert reader.validate()["ok"]
    got = (
        reader.search(queries_df(spark))
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    want = (
        bm25_topk(docs001, queries_df(spark), cfg)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_positions_compaction_bounds_files_and_preserves_phrase(
    spark, docs001, tmp_path
):
    """VERDICT r4 item 4: per-epoch positional appends accumulate small
    files per term_bucket with no rewrite path — compact_positions must
    bound the file count (rewriting ONLY crowded buckets, hardlinking the
    rest), commit a versioned dir + plan repoint, keep phrase output
    identical across the swap (stale reader included), and later
    incremental epochs must append into the NEW versioned dir."""
    from colbert_jl_spark.operators.phrase import phrase_matches
    from colbert_jl_spark.plans.build import IndexReader
    from colbert_jl_spark.sources.pages import docs_from_pages
    from colbert_jl_spark.streaming.ingest import compact_positions

    cfg = EngineConfig(block_size=32)
    pages_dir = str(tmp_path / "pages_in")
    idx = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt")
    phrases = [(0, "data table"), (1, "the data")]

    pages = pages_from_documents(docs001)
    waves = [pages.where(F.crc32(F.col("url")) % 4 == i) for i in range(4)]
    for w in waves[:3]:
        w.write.mode("append").parquet(pages_dir)
        stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg, positions=True)
        compact_streamed_index(spark, idx, cfg)

    def pos_dir():
        plan = json.loads(
            open(os.path.join(idx, "plan.json")).read()
        )
        return os.path.join(idx, plan.get("positions_dir", "positions"))

    def file_counts(d):
        out = {}
        for entry in os.listdir(d):
            if entry.startswith("term_bucket="):
                b = os.path.join(d, entry)
                out[entry] = sorted(
                    f for f in os.listdir(b) if f.startswith("part-")
                )
        return out

    before_dir = pos_dir()
    before = file_counts(before_dir)
    assert max(len(v) for v in before.values()) > 1, "fixture must fragment"
    stale = IndexReader(spark, idx)
    truth = {
        (r.pid, r.doc_id): r.n_occurrences
        for r in stale.phrase(phrases).collect()
    }
    assert truth

    rep = compact_positions(spark, idx, max_files_per_bucket=1)
    assert rep["mode"] == "positions" and rep["rewritten_term_buckets"]
    after_dir = pos_dir()
    assert after_dir != before_dir and os.path.isdir(before_dir)
    after = file_counts(after_dir)
    # bounded: every rewritten bucket holds exactly ONE file now
    for entry, files in after.items():
        b = int(entry.split("=", 1)[1])
        if b in rep["rewritten_term_buckets"]:
            assert len(files) == 1, (entry, files)
        else:
            # untouched buckets rode over as hardlinks (same inodes)
            old = {
                f: os.stat(os.path.join(before_dir, entry, f)).st_ino
                for f in before[entry]
            }
            new = {
                f: os.stat(os.path.join(after_dir, entry, f)).st_ino
                for f in files
            }
            assert old == new, entry

    # phrase identity across the swap, stale reader refreshes onto v2
    served = {
        (r.pid, r.doc_id): r.n_occurrences
        for r in stale.phrase(phrases).collect()
    }
    assert served == truth
    # idempotent
    assert compact_positions(spark, idx, max_files_per_bucket=1)["mode"] == "noop"

    # a later epoch appends into the NEW dir and phrase stays exact
    waves[3].write.mode("append").parquet(pages_dir)
    stream_pages_to_postings(spark, pages_dir, idx, ckpt, cfg, positions=True)
    r4 = compact_streamed_index(spark, idx, cfg)
    assert r4["compaction"]["mode"] == "incremental"
    assert r4.get("positions") is True
    full_truth = {
        (r.pid, r.doc_id): r.n_occurrences
        for r in phrase_matches(docs001, phrases, cfg).collect()
    }
    got = {
        (r.pid, r.doc_id): r.n_occurrences
        for r in IndexReader(spark, idx).phrase(phrases).collect()
    }
    assert got == full_truth


def test_invalidate_positions_is_metadata_first(spark, docs001, tmp_path):
    """ADVICE r4: invalidation must commit the metadata drop (stage
    marker + plan keys) BEFORE touching the data directory, and move the
    directory aside via atomic rename instead of rmtree-in-place — a
    concurrent reader then refuses service with the intended RuntimeError
    on refresh instead of hitting a raw FileNotFoundError mid-scan."""
    from colbert_jl_spark.plans.build import IndexBuilder, IndexReader
    from colbert_jl_spark.streaming.ingest import _invalidate_positions

    cfg = EngineConfig(block_size=32)
    idx = str(tmp_path / "idx")
    builder = IndexBuilder(idx, cfg)
    builder.build(docs001)
    builder.build_positions(docs001)
    reader = IndexReader(spark, idx)
    assert reader.phrase([(0, "data table")]).count() > 0

    _invalidate_positions(idx)
    plan = json.loads(open(os.path.join(idx, "plan.json")).read())
    assert "positions" not in plan and "positions_dir" not in plan
    assert not os.path.exists(os.path.join(idx, "positions"))
    assert os.path.isdir(os.path.join(idx, "positions.trash.0"))
    with pytest.raises(RuntimeError, match="positions stage"):
        reader.phrase([(0, "data table")])


def test_positions_gc_reclaims_bare_dir_after_two_swaps(
    spark, docs001, tmp_path
):
    """ADVICE r5 leak: the pre-versioning bare ``positions`` dir never
    matched any GC prefix, so once two compactions repointed plan.json to
    positions.v2 then v3 the original full copy leaked forever. With the
    fix the bare dir is retained exactly while it is current-or-previous
    and reclaimed one swap later; phrase output is identical across all
    three versions."""
    from colbert_jl_spark.plans.build import IndexBuilder, IndexReader
    from colbert_jl_spark.streaming.ingest import compact_positions

    cfg = EngineConfig(block_size=32)
    idx = str(tmp_path / "idx")
    builder = IndexBuilder(idx, cfg)
    builder.build(docs001)
    builder.build_positions(docs001)
    want = {
        (r.pid, r.doc_id): r.n_occurrences
        for r in IndexReader(spark, idx).phrase([(0, "data table")]).collect()
    }
    assert want

    # force a rewrite of every bucket twice (max_files_per_bucket=0)
    r1 = compact_positions(spark, idx, max_files_per_bucket=0)
    assert r1["mode"] == "positions"
    # after swap #1 the bare dir is the PREVIOUS version — retained
    assert os.path.isdir(os.path.join(idx, "positions"))
    assert os.path.isdir(os.path.join(idx, "positions.v2"))
    r2 = compact_positions(spark, idx, max_files_per_bucket=0)
    assert r2["mode"] == "positions"
    # after swap #2 it is two versions old — reclaimed, v2+v3 retained
    assert not os.path.exists(os.path.join(idx, "positions"))
    assert os.path.isdir(os.path.join(idx, "positions.v2"))
    assert os.path.isdir(os.path.join(idx, "positions.v3"))
    got = {
        (r.pid, r.doc_id): r.n_occurrences
        for r in IndexReader(spark, idx).phrase([(0, "data table")]).collect()
    }
    assert got == want


def test_invalidate_positions_moves_previous_version_aside(
    spark, docs001, tmp_path
):
    """ADVICE r5: invalidation used to rmtree the retained PREVIOUS
    version inline while only renaming the current one — a reader
    mid-scan on the previous version (resolved through the plan it
    refreshed a moment ago) got a raw FileNotFoundError, contradicting
    the {current, previous} retention contract. Now every live version
    dir is renamed aside as positions.trash.N (atomic, handles survive)
    and only trash from EARLIER invalidations is deleted."""
    from colbert_jl_spark.plans.build import IndexBuilder, IndexReader
    from colbert_jl_spark.streaming.ingest import (
        _invalidate_positions,
        compact_positions,
    )

    cfg = EngineConfig(block_size=32)
    idx = str(tmp_path / "idx")
    builder = IndexBuilder(idx, cfg)
    builder.build(docs001)
    builder.build_positions(docs001)
    assert IndexReader(spark, idx).phrase([(0, "data table")]).count() > 0
    r1 = compact_positions(spark, idx, max_files_per_bucket=0)
    assert r1["mode"] == "positions"  # current = positions.v2, prev = bare

    _invalidate_positions(idx)
    # current renamed to trash.0, previous (bare) to trash.1 — no rmtree
    t0 = os.path.join(idx, "positions.trash.0")
    t1 = os.path.join(idx, "positions.trash.1")
    assert os.path.isdir(t0) and os.path.isdir(t1)
    for t in (t0, t1):
        # contents intact: the renamed dirs still hold real parquet data
        assert any(
            f.startswith("part-")
            for b in os.listdir(t)
            if b.startswith("term_bucket=")
            for f in os.listdir(os.path.join(t, b))
        )
    assert not os.path.exists(os.path.join(idx, "positions"))
    assert not os.path.exists(os.path.join(idx, "positions.v2"))


def test_positions_trash_reclamation_is_age_gated(spark, docs001, tmp_path):
    """ADVICE r6: two invalidations in quick succession must NOT reclaim
    the first invalidation's trash (a reader may still be mid-scan on
    it) — only trash older than POSITIONS_TRASH_GRACE_SEC goes; younger
    dirs survive and the numbering continues past them."""
    from colbert_jl_spark.plans.build import IndexBuilder
    from colbert_jl_spark.streaming import ingest
    from colbert_jl_spark.streaming.ingest import _invalidate_positions

    cfg = EngineConfig(block_size=32)
    idx = str(tmp_path / "idx")
    builder = IndexBuilder(idx, cfg)
    builder.build(docs001)
    builder.build_positions(docs001)

    _invalidate_positions(idx)
    t0 = os.path.join(idx, "positions.trash.0")
    assert os.path.isdir(t0)

    # second invalidation IMMEDIATELY after: trash.0 is seconds old and
    # must survive; the fresh positions dir lands as trash.1
    builder.build_positions(docs001)
    _invalidate_positions(idx)
    t1 = os.path.join(idx, "positions.trash.1")
    assert os.path.isdir(t0), "young trash was reclaimed under a reader"
    assert os.path.isdir(t1)

    # age both past the grace period: the next invalidation reclaims them
    past = os.path.getmtime(t0) - ingest.POSITIONS_TRASH_GRACE_SEC - 60
    for t in (t0, t1):
        os.utime(t, (past, past))
    builder.build_positions(docs001)
    _invalidate_positions(idx)
    assert os.path.isdir(t0)  # numbering restarted: the NEW trash
    assert not os.path.exists(t1)
