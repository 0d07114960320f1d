"""Offline index build + load + search — the orchestration layer.

The analogue of the reference's top-level build driver ``index(indexer)``
(reference src/indexing.jl:63-147) and ``Searcher(index_path)``
(reference src/searching.jl:18-80), re-expressed as a staged Spark job:

    stage "postings"   — THE tokenize pass: docs → (term, doc_id, tf,
                         doclen) parquet. Everything downstream derives
                         from this materialization, so the expensive
                         extract+tokenize+explode shuffle runs exactly ONCE
                         over the corpus (at 100 TB this is the dominant
                         cost; re-tokenizing per stage would be a 4× blowup)
                         (reference encode_passages per chunk,
                          checkpoint.jl:159-189)
    stage "plan"       — exact corpus stats → plan.json
                         (reference setup(), collection_indexer.jl:115-139,
                          but EXACT instead of sampled), plus
                         (doc_id, doclen) docstats parquet
                         (reference doclens chunks, savers.jl:64-68)
    stage "dictionary" — (term, df, cf) parquet, partitioned by the SAME
                         term_bucket hash as the block table, so query-time
                         dictionary lookups prune directories and an
                         incremental compaction rewrites only the buckets
                         containing delta terms (VERDICT r3 item 4). idf is
                         NOT stored: it depends on the corpus-wide N, which
                         moves every incremental epoch — readers compute
                         idf_col(df, plan.n_docs) at scan time (a codegen
                         scalar), keeping untouched dictionary partitions
                         byte-identical across compactions
                         (reference ivf_lengths, collection_indexer.jl:352)
    stage "blocks"     — compressed posting blocks, partitioned by
                         term_bucket, sorted by term within partitions so
                         parquet row-group min/max prune term lookups
                         (reference chunks + codec,
                          collection_indexer.jl:271-297, residual.jl:586-604)
    stage "lineage"    — per-partition build metrics: docs seen, postings
                         emitted, bytes compressed (north-rule lineage rows;
                         the analogue of per-chunk metadata.json,
                          savers.jl:74-84)

Resumability (north rule; analogue of the reference's isdir guard +
_check_all_files_are_saved, indexing.jl:64-67 /
collection_indexer.jl:299-340): every stage commits atomically
(write to tmp dir → rename) and records itself in _STAGES.json; a re-run
skips completed stages, so a build interrupted after "dictionary"
restarts at "blocks" without recomputing stats. On Iceberg the same
structure maps to snapshot checkpoints; the staged-commit protocol here is
storage-agnostic.

``validate()`` re-checks the cross-stage invariants the reference asserts
at load time (sum(doclens) == num_embeddings, loaders.jl:85-87):
sum(dictionary.df) == total postings == sum(blocks.n_docs).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from colbert_jl_spark.config import EngineConfig
from colbert_jl_spark.functions.smalldf import local_df

STAGES = ("postings", "plan", "dictionary", "blocks", "lineage")

# validate()'s per-term_bucket data-file ceiling when the plan records no
# policy: compact_positions' default (4) plus slack for a few streamed
# epochs landing between scheduled compactions. Past this, phrase/search
# scans pay per-file open+footer cost every query — run minor_compact /
# compact_positions.
FILES_PER_BUCKET_CEILING = 8


def _stage_file(index_path: str) -> str:
    return os.path.join(index_path, "_STAGES.json")


def _load_stages(index_path: str) -> dict:
    try:
        with open(_stage_file(index_path)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def _mark_stage(index_path: str, stage: str, meta: dict | None = None) -> None:
    done = _load_stages(index_path)
    done[stage] = meta or {}
    done[stage]["completed_at"] = time.time()
    tmp = _stage_file(index_path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(done, f, indent=2, sort_keys=True)
    os.replace(tmp, _stage_file(index_path))


def write_plan(index_path: str, plan: dict) -> None:
    """Atomic plan.json commit (tmp write + rename). Every plan rewrite —
    build stages, compactions, the positions stage — goes through here: a
    concurrent IndexReader.refresh() re-reads plan.json on every search,
    and an in-place truncate-and-write would expose half-written JSON.
    The rename also gives the file a fresh inode, which is what refresh()
    keys its change detection on (mtime alone can collide within one
    filesystem timestamp granule)."""
    p = os.path.join(index_path, "plan.json")
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(plan, f, indent=2, sort_keys=True)
    os.replace(tmp, p)


def _atomic_write(df: DataFrame, final_dir: str, partition_by: str | None = None) -> None:
    """Write parquet to <dir>.tmp then rename — the poor man's snapshot
    commit (Iceberg gives this transactionally; plain parquet needs the
    rename protocol so a killed job never leaves a half-written stage)."""
    tmp = final_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(tmp)
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.replace(tmp, final_dir)


@dataclass
class IndexBuilder:
    """Builds a persisted block index at ``index_path``.

    ``force=True`` rebuilds from scratch (clears the stage ledger) —
    otherwise completed stages are skipped (resume semantics).

    ``sink`` is the table-commit seam: any callable
    ``(df, final_dir, partition_by=None)`` that durably materializes a
    DataFrame. Defaults to ``_atomic_write`` (parquet tmp→rename); on an
    Iceberg catalog the same seam is ``df.writeTo(table).createOrReplace()``
    — stage ordering, the _STAGES.json ledger, and resume semantics are
    sink-agnostic (injection-gated in tests/test_build.py)."""

    index_path: str
    cfg: EngineConfig = EngineConfig()
    sink: object = None

    def _write(self, df: DataFrame, final_dir: str, partition_by: str | None = None) -> None:
        (self.sink or _atomic_write)(df, final_dir, partition_by)

    def build(self, docs: DataFrame, force: bool = False) -> dict:
        from colbert_jl_spark.operators.codec_blocks import (
            posting_blocks,
            term_postings_with_doclen,
            with_term_partition,
        )
        from colbert_jl_spark.operators.postings import term_df

        os.makedirs(self.index_path, exist_ok=True)
        if force:
            for s in (*STAGES, "docstats"):
                shutil.rmtree(os.path.join(self.index_path, s), ignore_errors=True)
            try:
                os.remove(_stage_file(self.index_path))
            except FileNotFoundError:
                pass
        spark = docs.sparkSession

        # -- stage: postings (THE tokenize pass — runs once) ----------------
        postings_dir = os.path.join(self.index_path, "postings")
        n_docs = None
        n_postings = None
        if "postings" not in _load_stages(self.index_path):
            from pyspark.sql import Observation

            # corpus size AND posting-row count observed on the tokenize
            # pass itself (no separate count jobs — every extra job is a
            # cluster-wide scheduling barrier; the posting count known
            # here is what lets the plan and dictionary stages run
            # CONCURRENTLY below); n_docs includes all-stopword docs the
            # postings drop
            obs_docs = Observation("corpus_docs")
            obs_rows = Observation("posting_rows")
            pdl = term_postings_with_doclen(
                docs, self.cfg, count_obs=obs_docs
            ).observe(obs_rows, F.count(F.lit(1)).alias("n_postings"))
            self._write(pdl, postings_dir)
            _mark_stage(self.index_path, "postings")
            n_docs = int(obs_docs.get["n_docs"])
            n_postings = int(obs_rows.get["n_postings"])

        return self.finish_from_postings(
            spark,
            n_docs_total=docs.count() if n_docs is None else n_docs,
            n_postings_hint=n_postings,
        )

    def finish_from_postings(
        self,
        spark: SparkSession,
        n_docs_total: int,
        batch_ids: list[int] | None = None,
        n_postings_hint: int | None = None,
    ) -> dict:
        """Run every stage downstream of the materialized postings table.

        Split out so the streaming ingest path (streaming/ingest.py), which
        appends postings incrementally via foreachBatch, can compact into a
        queryable index without a docs DataFrame — it passes the doc count
        accumulated in its ingest log instead.

        ``batch_ids`` restricts the scan to those ``batch=`` partitions of
        the postings dir (partition-pruned). The streaming path passes its
        LOGGED batch ids: a micro-batch writes postings before its
        ingest-log row, so a compaction racing a live stream could
        otherwise index a batch that the ingest log (and therefore
        n_docs_total and the compaction state) doesn't know about — that
        batch would then be re-read as "new" by the next incremental
        compaction and double-counted."""
        from colbert_jl_spark.operators.codec_blocks import (
            posting_blocks,
            posting_blocks_columnar,
            with_term_partition,
        )
        from colbert_jl_spark.operators.postings import term_df

        postings_dir = os.path.join(self.index_path, "postings")
        postings = spark.read.parquet(postings_dir)
        if batch_ids is not None:
            postings = postings.where(F.col("batch").isin([int(b) for b in batch_ids]))

        # -- stages: plan + docstats ∥ dictionary ---------------------------
        # docstats = distinct (doc_id, doclen) from postings. Docs whose
        # every token was stoplisted never reach postings; they are
        # accounted for by n_empty_docs = docs.count() - docstats rows
        # (a metadata-only count), keeping N/avgdl exact WITHOUT an
        # anti-join shuffle over the corpus. The docstats aggregate rides
        # the WRITE action as Observation metrics — no extra count or
        # re-read jobs (every job is a cluster-wide scheduling barrier,
        # and in the pinned scaling runs the fixed per-job floors land in
        # both levels' wall time and compress the measured efficiency).
        def _run_docstats(obs_n_postings: bool):
            from pyspark.sql import Observation

            obs_ds = Observation("docstats_agg")
            seen = postings
            obs_post = None
            if obs_n_postings:
                obs_post = Observation("postings_total")
                seen = seen.observe(
                    obs_post, F.count(F.lit(1)).alias("n_postings")
                )
            seen = (
                seen.select("doc_id", "doclen")
                .distinct()
                .observe(
                    obs_ds,
                    F.count(F.lit(1)).alias("n"),
                    F.sum("doclen").alias("tot"),
                )
            )
            self._write(seen, os.path.join(self.index_path, "docstats"))
            row = obs_ds.get
            return row["n"], row["tot"] or 0, (
                int(obs_post.get["n_postings"]) if obs_post else None
            )

        def _plan_dict(n_seen: int, tot: int, n_postings: int) -> dict:
            return {
                "n_docs": n_docs_total,
                "n_empty_docs": n_docs_total - n_seen,
                "avgdl": tot / n_docs_total if n_docs_total else 0.0,
                "total_tokens": tot,
                "total_postings": int(n_postings),
                "bucket_size": max(
                    self.cfg.min_bucket_docs,
                    -(-n_docs_total // self.cfg.num_index_partitions),
                ),
                "config": json.loads(self.cfg.to_json()),
                "format_version": 1,
            }

        # size the term-hash directory partitioning to the data:
        # ~2M postings per partition dir, clamped. A fixed large count
        # explodes file counts at small scale (tasks × dirs files);
        # too small a count kills query-time pruning. Shared by the
        # dictionary and block tables; plan.json records the chosen
        # value — the same rewrite-after-build pattern the reference
        # uses (indexing.jl:125-132).
        def _term_partitions_for(n_postings: int) -> int:
            return int(
                self.cfg.term_partitions
                or min(4096, max(4, n_postings // 2_000_000))
            )

        # (term, df, cf) only — NO idf (see module docstring: idf is a
        # function of the moving N; computing it at read keeps untouched
        # partitions byte-stable under incremental merges). The
        # repartition is ON the partition column: term_df's output is
        # hash-partitioned on term, so a bare partitionBy write would
        # land up to n_tasks files in EVERY bucket dir. Dictionary rows
        # are one per term — vocab-scale, bucket-balanced by the hash —
        # so this extra shuffle is small and every bucket dir gets
        # exactly one file (validate()'s FILES_PER_BUCKET_CEILING
        # invariant).
        def _run_dictionary(term_partitions: int) -> None:
            dic = with_term_partition(
                term_df(postings.select("term", "doc_id", "tf")),
                term_partitions,
            )
            dic = dic.repartition("term_bucket").sortWithinPartitions("term")
            self._write(
                dic, os.path.join(self.index_path, "dictionary"), "term_bucket"
            )

        done = _load_stages(self.index_path)
        if (
            "plan" not in done
            and "dictionary" not in done
            and n_postings_hint is not None
        ):
            # FRESH-BUILD fast path: the postings write already observed
            # the posting-row count, so the docstats write and the
            # dictionary shuffle+write share NO data dependency — run
            # them as two concurrent driver-thread jobs (Spark schedules
            # both; the later job back-fills executors freed by the
            # earlier one's tail). Stages are marked only after BOTH
            # commit, in ledger order — a crash mid-pair re-runs both
            # idempotent writes on resume.
            from concurrent.futures import ThreadPoolExecutor

            tp = _term_partitions_for(n_postings_hint)
            with ThreadPoolExecutor(max_workers=2) as pool:
                fut_ds = pool.submit(_run_docstats, False)
                fut_dic = pool.submit(_run_dictionary, tp)
                n_seen, tot, _ = fut_ds.result()
                fut_dic.result()
            plan = _plan_dict(n_seen, tot, n_postings_hint)
            plan["term_partitions"] = tp
            write_plan(self.index_path, plan)
            _mark_stage(self.index_path, "plan", {"n_docs": n_seen})
            _mark_stage(self.index_path, "dictionary")
        else:
            # resume / streaming-compaction path: sequential stages with
            # the posting count observed during the docstats write
            if "plan" not in done:
                n_seen, tot, n_post = _run_docstats(True)
                plan = _plan_dict(n_seen, tot, n_post)
                write_plan(self.index_path, plan)
                _mark_stage(self.index_path, "plan", {"n_docs": n_seen})
            plan = self.plan()
            if "dictionary" not in _load_stages(self.index_path):
                # n_postings == postings row count (one row per
                # (term, doc)) — observed during the plan stage's
                # docstats write; the count() fallback covers indexes
                # resumed from a pre-r5 partial build whose plan lacks
                # the key.
                n_postings = plan.get("total_postings")
                if n_postings is None:
                    n_postings = postings.count()
                    plan["total_postings"] = int(n_postings)
                plan["term_partitions"] = _term_partitions_for(n_postings)
                write_plan(self.index_path, plan)
                _run_dictionary(plan["term_partitions"])
                _mark_stage(self.index_path, "dictionary")
        plan = self.plan()

        # -- stage: blocks ----------------------------------------------
        if "blocks" not in _load_stages(self.index_path):
            dic = spark.read.parquet(os.path.join(self.index_path, "dictionary"))
            n_postings = plan.get("total_postings")
            if n_postings is None:  # pre-r4 index resumed mid-build
                n_postings = dic.agg(F.sum("df")).first()[0] or 0
            term_partitions = plan.get(
                "term_partitions",
                int(min(4096, max(4, n_postings // 2_000_000))),
            )
            # spill-aware shuffle sizing: the blocks exchange moves every
            # posting once; per-reducer sorts must fit in memory. Sized to
            # the DATA (~4M narrow posting rows ≈ 128 MB per partition),
            # floored at the session's core-count default — at 960k docs
            # (34M postings) this keeps partitions = cores, at 2M+ docs it
            # grows them before the sort would spill (measured round 1:
            # sp = cores spills beyond ~2M docs on 128 GiB). AQE coalesces
            # over-splits, so erring high is cheap; restored after the stage.
            prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
            data_sp = max(int(prev_sp), -(-int(n_postings) // 4_000_000))
            # round UP to a whole number of task waves: 9 encode tasks on
            # 4 cores run as 3 ragged waves with idle slots in the last —
            # a pure scaling-efficiency leak at any core count (measured
            # r7: blocks stage eff 0.73 with the ragged tail). Scale-
            # adaptive: derived from cores and data size, not a constant.
            par = max(1, spark.sparkContext.defaultParallelism)
            data_sp = par * -(-data_sp // par)
            spark.conf.set("spark.sql.shuffle.partitions", str(data_sp))
            # the try opens IMMEDIATELY after conf.set: encode() runs eager
            # Spark jobs (the collision-salt probes) and the plan rewrite can
            # raise — an exception anywhere before the write must not leak
            # the inflated setting into the caller's session
            try:
                plan["term_partitions"] = term_partitions
                write_plan(self.index_path, plan)
                encode = (
                    posting_blocks_columnar
                    if self.cfg.block_format == "columnar"
                    else posting_blocks
                )
                # tid-collision safety WITHOUT the up-front probe jobs:
                # the check rides the blocks write itself. Two observed
                # counts — block rows before and after the dictionary
                # join — must be EQUAL: any xxhash64(term, salt) collision
                # makes ≥2 dictionary terms join every block row of the
                # shared tid, strictly inflating the post-join count (and
                # the colliding terms' postings would have been merged
                # into corrupt blocks). On the astronomically rare
                # mismatch (~1e-4 at web vocab for salt 0) the stage
                # re-encodes once with an explicitly probed salt.
                from pyspark.sql import Observation

                from colbert_jl_spark.operators.codec_blocks import (
                    collision_free_tid_salt,
                )

                salt = 0
                for attempt in range(2):
                    obs_pre = Observation(f"blocks_pre_join_{attempt}")
                    obs_join = Observation(f"blocks_post_join_{attempt}")
                    blocks = encode(
                        postings,
                        dic.select("term", "df"),
                        plan["n_docs"],
                        plan["avgdl"],
                        self.cfg,
                        bucket_size=plan["bucket_size"],
                        salt=salt,
                        count_obs=(obs_pre, obs_join),
                    )
                    blocks = with_term_partition(blocks, term_partitions)
                    # NO repartition before the partitionBy write: the
                    # encode output is already (term, bucket)-grouped, so
                    # rows of one term are contiguous within each task and
                    # parquet row-group min/max stats on `term` stay
                    # tight; a repartition("term_bucket") here would add a
                    # full shuffle of the entire index whose 64-key hash
                    # skews badly at high parallelism. The files-per-
                    # bucket consequence (≈ write tasks per bucket) is
                    # recorded as the plan's policy below so validate()
                    # grades the index against what the build actually
                    # promises.
                    self._write(
                        blocks,
                        os.path.join(self.index_path, "blocks"),
                        "term_bucket",
                    )
                    if int(obs_pre.get["n"]) == int(obs_join.get["n"]):
                        break
                    if attempt:  # probed salt still colliding: impossible
                        raise RuntimeError(
                            "tid collision persists after salt probe"
                        )
                    salt = collision_free_tid_salt(dic)
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
            # record the batch write's actual small-file policy (ADVICE
            # r6): without a per-bucket coalesce the blocks stage lands up
            # to data_sp files per bucket, so a fresh healthy index built
            # at high parallelism would otherwise fail validate()'s
            # default ceiling. Driver-side listdir — bucket count is
            # ≤4096, never data-scale.
            observed = 0
            blocks_dir = os.path.join(self.index_path, "blocks")
            if os.path.isdir(blocks_dir):
                for entry in os.listdir(blocks_dir):
                    if entry.startswith("term_bucket="):
                        d = os.path.join(blocks_dir, entry)
                        observed = max(
                            observed,
                            sum(
                                1
                                for f in os.listdir(d)
                                if f.startswith("part-")
                            ),
                        )
            plan["max_files_per_bucket"] = max(
                FILES_PER_BUCKET_CEILING, observed
            )
            write_plan(self.index_path, plan)
            _mark_stage(self.index_path, "blocks")

        # -- stage: lineage (per doc-bucket build metrics) -------------------
        if "lineage" not in _load_stages(self.index_path):
            blocks = spark.read.parquet(os.path.join(self.index_path, "blocks"))
            if "payload" in blocks.columns:  # varint format: exact bytes
                byte_col = F.length("payload")
            else:  # columnar: logical in-memory bytes (parquet packs further)
                byte_col = F.col("n_docs") * F.lit(16)
            from pyspark.sql import Observation

            obs_lin = Observation("lineage_buckets")
            lineage = blocks.groupBy("bucket").agg(
                F.sum("n_docs").alias("postings_emitted"),
                F.count("*").alias("blocks_written"),
                F.sum(byte_col).alias("bytes_compressed"),
                F.countDistinct("term").alias("terms_seen"),
            ).observe(obs_lin, F.count(F.lit(1)).alias("n_buckets"))
            self._write(lineage, os.path.join(self.index_path, "lineage"))
            # record the doc-bucket count in the plan (one lineage row per
            # bucket): IndexReader's fused-path gate reads it as metadata
            # instead of running a lineage scan on the first query. The
            # count is observed during the write — no read-back job.
            plan["n_buckets"] = int(obs_lin.get["n_buckets"])
            write_plan(self.index_path, plan)
            _mark_stage(self.index_path, "lineage")

        return plan

    def plan(self) -> dict:
        with open(os.path.join(self.index_path, "plan.json")) as f:
            return json.load(f)

    def build_positions(self, docs: DataFrame) -> None:
        """OPTIONAL positional stage (VERDICT r3 item 1): persist
        (term, doc_id, positions) — operators/phrase.token_position_lists
        — partitioned by the SAME term_bucket hash as the block table, so
        IndexReader.phrase() serves phrase queries from a term-pruned scan
        instead of re-tokenizing the corpus per call. One extra corpus
        pass over the RAW (pre-stoplist) token stream — positions cannot
        derive from the stoplisted postings table, because phrase
        semantics keep stopword position slots.

        Run AFTER build() (needs plan.json's term_partitions); skipped if
        already marked, resumable like every stage. plan.json records
        {"positions": true} so readers can gate without a filesystem
        probe. Streamed indexes: ingest with ``positions=True``
        (streaming/ingest.stream_pages_to_postings) and the compactors
        MAINTAIN this stage (full rebuilds it from the per-batch raw
        captures, incremental appends the delta); an ingest WITHOUT the
        capture invalidates it on compaction so phrase() raises a clear
        error instead of silently missing new documents."""
        from colbert_jl_spark.operators.codec_blocks import with_term_partition
        from colbert_jl_spark.operators.phrase import token_position_lists

        if "positions" in _load_stages(self.index_path):
            return
        plan = self.plan()
        pl = with_term_partition(
            token_position_lists(docs, self.cfg), plan["term_partitions"]
        )
        self._write(
            pl, os.path.join(self.index_path, "positions"), "term_bucket"
        )
        plan["positions"] = True
        write_plan(self.index_path, plan)
        _mark_stage(self.index_path, "positions")


class IndexReader:
    """Query-side handle — the Searcher analogue. Unlike the reference,
    which materializes the whole compressed index in driver RAM
    (reference src/loaders.jl:91-113; flagged at SURVEY.md §3.3 as the
    central scalability limit), only plan.json is driver-side; dictionary,
    docstats and blocks stay distributed parquet scans with pushed-down
    term filters.

    Version-retention contract (ADVICE r4): compactions commit dictionary/
    blocks/positions as VERSIONED dirs and keep exactly {current,
    previous} — a reader is safe across ONE compaction it slept through
    (refresh() re-resolves on the next call), and a reader that pauses
    between refresh() and the scan while TWO compactions land gets one
    transparent refresh-and-retry (_stage_df) before the error surfaces.
    Queries already returned as lazy DataFrames can still fail at action
    time if their version is GC'd mid-flight — re-issue the query through
    the reader (on Iceberg, snapshot isolation removes this window)."""

    # above this many distinct terms in one search() call, the per-term
    # In(term, …) scan filter is skipped (the broadcast join prunes
    # instead) — see the comment in search(). 32 covers every interactive
    # query; only bulk batched suites cross it.
    max_inlist_terms: int = 32

    # search_local collects the query terms' pruned block rows to the
    # driver; above this many estimated postings (Σ df over the query's
    # terms — known driver-side from the dictionary lookup that also feeds
    # the idf overlay) it auto-falls back to the distributed search()
    # (VERDICT r3 item 5: a head-term analytical query must not collect a
    # GB-scale slice into the driver). 5M postings ≈ 10-80 MB of block
    # rows — a comfortable interactive collect.
    max_local_postings: int = 5_000_000

    def __init__(self, spark: SparkSession, index_path: str, cfg: EngineConfig | None = None):
        self.spark = spark
        self.index_path = index_path
        self._load_plan()
        self.cfg = cfg or EngineConfig.from_plan_config(self.plan["config"])

    def _plan_stamp(self) -> tuple:
        """Change stamp for plan.json: (inode, mtime_ns, size). Every plan
        commit goes through write_plan's tmp+rename, so the inode changes
        on each rewrite — mtime alone can collide when two commits land
        within one filesystem timestamp granule (coarse-granularity NFS/
        HFS+ mounts), which would leave a reader permanently serving new
        blocks under an old plan."""
        st = os.stat(os.path.join(self.index_path, "plan.json"))
        return (st.st_ino, st.st_mtime_ns, st.st_size)

    def _load_plan(self) -> None:
        p = os.path.join(self.index_path, "plan.json")
        self._plan_stamp_seen = self._plan_stamp()
        with open(p) as f:
            self.plan = json.load(f)
        # driver-side (term → (df, idf)) cache: filled lazily by
        # search_local's dictionary lookup, invalidated whenever the plan
        # snapshot moves (ADVICE r3: the idf_now collect ran per query on
        # the hot latency path; cached, repeat queries run ONE action)
        self._term_stats: dict[str, tuple[int, float]] = {}

    def refresh(self) -> "IndexReader":
        """Re-validate the plan snapshot against plan.json on disk.

        Called automatically at the top of every search entry point
        (ADVICE r3, medium): a reader that outlives an incremental
        compaction (streaming/ingest.py) would otherwise serve the NEW
        delta blocks under the OLD plan — no idf overlay, an understated
        bound_scale (over-pruning can silently drop correct top-k rows),
        and a stale n_buckets can emit per-bucket duplicate ranks on the
        fused path. A plan.json change (detected by the (inode, mtime_ns,
        size) stamp — see _plan_stamp) reloads the plan, drops every
        plan-derived cache (_n_buckets, the term-stats cache) and re-pins
        the hot block cache.

        Consistency boundary (documented, not closed): the compactor
        appends delta blocks BEFORE committing plan.json, so a query that
        starts inside that window can see delta blocks under the old plan.
        The window is one plan-file write wide; on Iceberg the block append
        and metadata commit are one transaction and the window vanishes.
        Single-writer compaction is assumed throughout."""
        if self._plan_stamp() == self._plan_stamp_seen:
            return self
        self._load_plan()
        if hasattr(self, "_n_buckets"):
            del self._n_buckets
        if hasattr(self, "_hot_blocks") or hasattr(self, "_hot_positions"):
            self.release()
            self.load_hot()
        return self

    def _ensure_term_stats(self, terms) -> None:
        """Fill the driver-side (term → (df, idf)) cache for any of
        ``terms`` not yet seen — ONE term_bucket-pruned dictionary scan
        for the cache misses, zero actions when everything is cached.
        Missing terms (zero df / not in the vocabulary) cache as (0, 0.0).
        The cache is dropped whenever refresh() sees a new plan."""
        from colbert_jl_spark.functions.hashing import spark_pmod_hash

        need = [t for t in terms if t not in self._term_stats]
        if not need:
            return
        tp = self.plan.get("term_partitions")
        dic = self.dictionary.where(F.col("term").isin(need))
        if tp and "term_bucket" in dic.columns:
            nb = sorted({spark_pmod_hash(t, tp) for t in need})
            dic = dic.where(F.col("term_bucket").isin(nb))
        found = {
            r.term: (int(r.df), float(r.idf))
            for r in dic.select("term", "df", "idf").collect()
        }
        for t in need:
            self._term_stats[t] = found.get(t, (0, 0.0))

    def release(self) -> "IndexReader":
        """Drop the hot block cache (the load_hot pin). Call when retiring
        a still-hot reader whose SparkSession lives on: the session cache
        manager substitutes a cached plan into any matching scan of the
        same files, so an undisposed pin from a retired reader can serve
        pre-compaction block data to OTHER readers after a major
        compaction rewrites the block dir. (A reader that is still being
        queried needs no manual call — refresh() re-pins it when the plan
        moves.)"""
        if hasattr(self, "_hot_blocks"):
            hot = self._hot_blocks
            del self._hot_blocks
            hot.unpersist()
        if hasattr(self, "_hot_positions"):
            hot = self._hot_positions
            del self._hot_positions
            hot.unpersist()
        return self

    def _stage_dir(self, plan_key: str, default: str) -> str:
        """Resolved on-disk path of a versioned stage dir (plan snapshot,
        no refresh) — the filesystem companion of ``_stage_df``."""
        return os.path.join(self.index_path, self.plan.get(plan_key, default))

    def _stage_df(self, plan_key: str, default: str) -> DataFrame:
        """Scan a versioned stage dir resolved through the plan snapshot,
        with ONE refresh-and-retry if the dir vanished underneath us:
        version GC keeps {current, previous}, so a reader that pauses
        between refresh() and the scan while two compactions land can
        hold a deleted path (ADVICE r4) — the retry re-resolves through
        the NEW plan; a second failure is a real error."""
        path = os.path.join(self.index_path, self.plan.get(plan_key, default))
        if not os.path.isdir(path):
            self.refresh()
            path = os.path.join(
                self.index_path, self.plan.get(plan_key, default)
            )
        return self.spark.read.parquet(path)

    @property
    def dictionary(self) -> DataFrame:
        """(term, df, cf[, term_bucket], idf). r4-format dictionaries store
        only (df, cf) partitioned by term_bucket — idf depends on the
        corpus-wide N, so it is computed here from the CURRENT plan (a
        codegen scalar on a pruned scan), which is also what keeps
        untouched dictionary partitions byte-identical across incremental
        compactions. Pre-r4 dictionaries carry a stored idf column and are
        read as-is."""
        d = self._stage_df("dictionary_dir", "dictionary")
        if "idf" not in d.columns:
            from colbert_jl_spark.operators.bm25 import idf_col

            d = d.withColumn("idf", idf_col(F.col("df"), self.plan["n_docs"]))
        return d

    @property
    def docstats(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.index_path, "docstats"))

    @property
    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.index_path, "lineage"))

    def search(
        self,
        queries: DataFrame | list[tuple[int, str]],
        k: int | None = None,
        mode: str = "topk",
    ) -> DataFrame:
        """Top-k via block-max WAND over the persisted block table —
        the ``search(searcher, query, k)`` analogue
        (reference src/searching.jl:93-128).

        Queries are tokenized DRIVER-side (tiny by definition; the
        reference also encodes queries driver-side,
        reference src/modelling/checkpoint.jl:271-301) with the python
        mirror of the frozen tokenizer, and term_bucket partition filters
        are computed with the pure-python xxhash64 clone. The
        (term_bucket, term) IN-filters prune partition DIRECTORIES and
        parquet row groups — the engine's nprobe analogue (reference
        ranking.jl:30-36). Terms this reader has never seen cost ONE tiny
        term_bucket-pruned dictionary lookup first (r7: it feeds the
        zero-df pruning below and is the same cache search_local's size
        guard uses); WARM queries run exactly one Spark job — the query
        DAG itself — and provably-empty queries run none.

        ``queries`` may be a DataFrame (qid, query) — collected, it is
        driver data anyway — or a list of (qid, query) pairs.

        ``mode``: "topk" (disjunctive block-max WAND, default) or
        "intersect" (conjunctive — docs must contain EVERY query term;
        the zig-zag skip-pointer executor, wand.wand_intersect_topk)."""
        from collections import Counter

        from colbert_jl_spark.functions.hashing import spark_pmod_hash
        from colbert_jl_spark.functions.tokenizer import py_terms
        from colbert_jl_spark.operators.wand import wand_intersect_topk, wand_topk

        self.refresh()
        if isinstance(queries, DataFrame):
            queries = [(r["qid"], r["query"]) for r in queries.collect()]
        qt_rows = []
        for qid, qtext in queries:
            for term, qtf in Counter(py_terms(qtext, None, self.cfg.stopwords)).items():
                qt_rows.append((int(qid), term, int(qtf)))
        out_schema = "qid long, rank int, doc_id long, score double"
        if not qt_rows:
            return local_df(self.spark, [], out_schema)
        terms = sorted({t for _, t, _ in qt_rows})
        # zero-df pruning from the driver-side term-stats cache (the same
        # cache search_local's size guard uses; cache-missed terms cost
        # ONE term_bucket-pruned dictionary lookup, then repeat queries
        # run zero auxiliary jobs): a term with df == 0 has no block rows
        # by construction, so dropping its qt rows is a no-op on the
        # result — and a query whose terms are ALL absent (or, in
        # intersect mode, ANY absent: the conjunction guard empties that
        # qid) returns without scheduling a DAG at all.
        self._ensure_term_stats(terms)
        zero = {t for t in terms if self._term_stats[t][0] == 0}
        if zero:
            if mode == "intersect":
                dead = {q for q, t, _ in qt_rows if t in zero}
                qt_rows = [r for r in qt_rows if r[0] not in dead]
            else:
                qt_rows = [r for r in qt_rows if r[1] not in zero]
            if not qt_rows:
                return local_df(self.spark, [], out_schema)
            terms = sorted({t for _, t, _ in qt_rows})
        blocks = self.blocks
        # interactive queries (few distinct terms): an In(term, …) filter
        # pushes into the parquet reader and prunes row groups via min/max
        # stats. A BATCHED suite of thousands of distinct queries would
        # compile a giant IN list into every scan instead (VERDICT r2 item
        # 6) — above the threshold the broadcast hash join against qt is
        # the term filter (Catalyst still prunes via the join), and only
        # the term_bucket DIRECTORY pruning stays as an IN list (bounded by
        # term_partitions ints — never giant).
        if len(terms) <= self.max_inlist_terms:
            blocks = blocks.where(F.col("term").isin(terms))
        tp = self.plan.get("term_partitions")
        buckets = sorted({spark_pmod_hash(t, tp) for t in terms}) if tp else None
        if buckets is not None:
            blocks = blocks.where(F.col("term_bucket").isin(buckets))
        executor = wand_intersect_topk if mode == "intersect" else wand_topk
        # incrementally-compacted index: pre-existing block rows carry
        # ENCODE-time idf/max_score, stale after df/N/avgdl moved. Attach
        # the CURRENT dictionary idf to the query side (a pushed-down,
        # term_bucket-PRUNED scan inside the same query DAG — the r4
        # bucket-partitioned dictionary prunes it like the block table)
        # and widen block-max bounds for avgdl drift — see
        # wand._refresh_matched_stats. Batch-built indexes skip this
        # entirely (no extra scan on the hot path).
        bound_scale = 1.0
        inc = self.plan.get("incremental")
        # Interactive case (≤ max_inlist_terms distinct terms, no
        # incremental idf overlay): the query side stays a driver-side
        # LITERAL — no qterms DataFrame is even built; the executor
        # compiles it as a map expression instead of a broadcast join
        # (wand._attach_query_terms_literal: no broadcast-build job), and
        # single-query calls group by bucket alone so the
        # bucket-partitioned hot cache satisfies the grouping with NO
        # Exchange (load_hot).
        use_literal = (not inc) and len(terms) <= self.max_inlist_terms
        qt = (
            None
            if use_literal
            else local_df(self.spark, qt_rows, "qid long, term string, qtf long")
        )
        if inc:
            dic = self.dictionary
            if buckets is not None and "term_bucket" in dic.columns:
                dic = dic.where(F.col("term_bucket").isin(buckets))
            qt = qt.join(
                dic.select("term", F.col("idf").alias("idf_q")),
                "term",
                "left",
            )
            bound_scale = max(1.0, self.plan["avgdl"] / inc["min_enc_avgdl"])
        # n_terms for the intersect guard is computed from the RAW query
        # rows BEFORE the block join, so zero-df terms still (correctly)
        # empty their conjunctive query — on the literal path the executor
        # counts them driver-side from qt_rows for the same reason
        return executor(
            blocks, qt, self.cfg, self.plan["avgdl"], k,
            bound_scale=bound_scale, fused=self._single_bucket(),
            qt_literal=qt_rows if use_literal else None,
        )

    def _single_bucket(self) -> bool:
        """True iff the whole index lives in ONE doc-range bucket — then
        each (qid, bucket) WAND group spans the query's full doc space and
        the final ranking window (an extra exchange+sort per query DAG) is
        fused away (VERDICT r2 item 9). Decided from plan.json's
        ``n_buckets`` (recorded by the lineage stage) — NO Spark job, so
        search()'s no-pre-query-job guarantee holds even on the first
        call. Indexes written before n_buckets existed fall back to one
        lazy lineage count (cached on the reader); the plan-level
        n_docs <= bucket_size shortcut alone would trust doc_ids to
        start at 0, which url-derived ids do not promise."""
        if not hasattr(self, "_n_buckets"):
            nb = self.plan.get("n_buckets")
            if nb is not None:
                self._n_buckets = int(nb)
            elif self.plan["n_docs"] > self.plan["bucket_size"]:
                self._n_buckets = 2  # provably >1 without any job
            else:
                self._n_buckets = (
                    self.lineage.select("bucket").distinct().count()
                )
        return self._n_buckets == 1

    def search_local(
        self,
        queries: DataFrame | list[tuple[int, str]],
        k: int | None = None,
        mode: str = "topk",
    ) -> DataFrame:
        """Latency-mode search: ONE data-path Spark action (the pruned
        block fetch — a filter+collect on the cached/parquet block table,
        no shuffle, no Python workers), then the SAME per-group
        WAND/intersect executors run in the driver process and the
        k·buckets-row merge happens driver-side (VERDICT r2 item 9's
        sketch).

        Query terms not yet seen by this reader cost ONE extra tiny
        auxiliary action first: a term_bucket-pruned dictionary lookup
        whose (df, idf) rows land in a driver-side cache (so a warmed
        serving loop runs exactly one action per query). That same df
        estimate is the SIZE GUARD (VERDICT r3 item 5): when the query
        terms' summed df exceeds ``max_local_postings`` the call
        transparently falls back to the distributed search() — identical
        executors, identical results — instead of collecting a GB-scale
        head-term slice into the driver.

        The collect volume is the query terms' block rows — the reference
        Searcher holds the ENTIRE compressed index in driver RAM
        (reference src/loaders.jl:91-113); this mode holds one query's
        slice of it, transiently (and the guard keeps "slice" honest)."""
        from collections import Counter

        import numpy as np
        import pandas as pd

        from colbert_jl_spark.functions.codec import (
            decode_block,
            decode_block_packed,
        )
        from colbert_jl_spark.functions.hashing import spark_pmod_hash
        from colbert_jl_spark.functions.tokenizer import py_terms
        from colbert_jl_spark.operators.wand import (
            _exact_round6,
            _intersect_one_group,
            _wand_one_group,
        )

        self.refresh()
        k = k or self.cfg.top_k
        if isinstance(queries, DataFrame):
            queries = [(r["qid"], r["query"]) for r in queries.collect()]
        qt_rows = []
        for qid, qtext in queries:
            for term, qtf in Counter(py_terms(qtext, None, self.cfg.stopwords)).items():
                qt_rows.append((int(qid), term, int(qtf)))
        out_schema = "qid long, rank int, doc_id long, score double"
        if not qt_rows:
            return local_df(self.spark, [], out_schema)
        terms = sorted({t for _, t, _ in qt_rows})
        tp = self.plan.get("term_partitions")

        # driver-side (df, idf) for the query terms — cache-missed terms
        # fetched in one pruned scan (see docstring); feeds BOTH the size
        # guard and the incremental-index idf freshness overlay
        self._ensure_term_stats(terms)
        est = sum(self._term_stats[t][0] for t in terms)
        if est == 0:  # every term absent from the corpus: provably empty
            return local_df(self.spark, [], out_schema)
        if est > self.max_local_postings:
            return self.search(queries, k, mode)

        blocks = self.blocks.where(F.col("term").isin(terms))
        if tp:
            buckets = sorted({spark_pmod_hash(t, tp) for t in terms})
            blocks = blocks.where(F.col("term_bucket").isin(buckets))
        bpdf = blocks.toPandas()  # THE one data-path Spark action

        inc = self.plan.get("incremental")
        bound_scale = 1.0
        if inc and len(bpdf):
            idf_now = {t: self._term_stats[t][1] for t in terms}
            bound_scale = max(1.0, self.plan["avgdl"] / inc["min_enc_avgdl"])
            fresh = bpdf["term"].map(idf_now)
            bpdf["max_score"] = (
                bpdf["max_score"] / bpdf["idf"] * fresh * bound_scale
            )
            bpdf["idf"] = fresh

        qpdf = pd.DataFrame(qt_rows, columns=["qid", "term", "qtf"])
        n_terms = qpdf.groupby("qid")["term"].nunique()
        matched = bpdf.merge(qpdf, on="term") if len(bpdf) else bpdf
        decoder = (
            decode_block_packed
            if self.cfg.block_format == "packed"
            else decode_block
        )
        avgdl = self.plan["avgdl"]
        parts = []
        if len(matched):
            for (qid, _bucket), grp in matched.groupby(["qid", "bucket"], sort=False):
                if mode == "intersect":
                    grp = grp.assign(n_terms=int(n_terms[qid]))
                    parts.append(
                        _intersect_one_group(
                            grp, k, self.cfg.k1, self.cfg.b, avgdl, decoder
                        )
                    )
                else:
                    parts.append(
                        _wand_one_group(
                            grp, k, self.cfg.k1, self.cfg.b, avgdl, decoder
                        )
                    )
        cand = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame({"qid": [], "doc_id": [], "score": []})
        )
        rows = []
        for qid in sorted(cand["qid"].unique()):
            g = cand[cand["qid"] == qid]
            ids = g["doc_id"].to_numpy(dtype="int64")
            scs = g["score"].to_numpy(dtype="float64")
            r6 = _exact_round6(scs)
            sel = np.lexsort((ids, -r6))[:k]
            for rank, j in enumerate(sel, start=1):
                rows.append((int(qid), rank, int(ids[j]), float(r6[j])))
        return local_df(self.spark, rows, out_schema)

    def phrase(self, phrases: list[tuple[int, str]]) -> DataFrame:
        """(pid, doc_id, n_occurrences) — exact consecutive-token phrase
        matching served from the PERSISTED positions stage (VERDICT r3
        item 1): the phrase's terms prune the positional scan by term
        IN-list and term_bucket directory (both computed driver-side —
        the same nprobe shape as search()), so a phrase query reads its
        terms' slice of the corpus instead of re-tokenizing it
        (operators/phrase.phrase_matches, the inline shape, remains for
        ad-hoc frames). Each phrase is additionally pruned RAREST-TERM-
        FIRST (VERDICT r4 item 3, _phrase_anchor): candidate starts are
        semi-joined against the lowest-df term's doc set before the one
        shuffle, so a head term's positions move only inside docs that
        can match. The anchor's df comes from the same driver-side
        term-stats cache as search_local's guard — cache-missed terms
        cost ONE pruned dictionary lookup, then repeat phrases run a
        single query DAG. Output-identical to the inline operator; gated
        in tests/test_phrase.py with plan assertions (positions table
        scanned, never the corpus; one hash Exchange)."""
        from colbert_jl_spark.functions.hashing import spark_pmod_hash
        from colbert_jl_spark.functions.tokenizer import py_tokens
        from colbert_jl_spark.operators.phrase import (
            phrase_matches_from_positions,
        )

        self.refresh()
        if not self.plan.get("positions"):
            raise RuntimeError(
                "this index has no positions stage — run "
                "IndexBuilder.build_positions(docs) once, or use the "
                "inline operators/phrase.phrase_matches(docs, phrases)"
            )
        terms = sorted(
            {t for _, text in phrases for t in py_tokens(text, None)}
        )
        pos = getattr(self, "_hot_positions", None)
        if pos is None:
            pos = self._stage_df("positions_dir", "positions")
        if terms:
            pos = pos.where(F.col("term").isin(terms))
            tp = self.plan.get("term_partitions")
            if tp:
                buckets = sorted({spark_pmod_hash(t, tp) for t in terms})
                pos = pos.where(F.col("term_bucket").isin(buckets))
        anchor = self._phrase_anchor(phrases, pos)
        return phrase_matches_from_positions(
            pos, phrases, self.spark, anchor=anchor
        )

    # per-phrase ceiling on the anchor term's df for rarest-term-first
    # pruning: the anchor doc set rides a broadcast, so it must stay
    # executor-memory-small. 1M (pid, doc_id) rows ≈ 16 MB — comfortably
    # broadcastable; a phrase whose RAREST term exceeds this is all head
    # terms, where doc-set pruning buys little anyway (ratio bounded by
    # min_df/max_df) and the candidate-bounded shuffle is the honest cost.
    max_anchor_df: int = 1_000_000

    # floor below which anchoring is skipped for phrases whose terms are
    # ALL dictionary-estimable: when Σ df of the phrase terms is this
    # small, the whole candidate set already fits one shuffle cheaply and
    # the anchor subtree (a broadcast materialization per query DAG) is
    # pure latency tax — measured +0.35 s hot-phrase p50 on the bench
    # fixture. Phrases carrying a stoplisted term always anchor: their
    # positional volume is invisible to the df estimate (corpus-scale in
    # the positions table, absent from the dictionary), which is exactly
    # the head-term case the pruning exists for. df=0 anchors also always
    # apply — they kill provably unmatchable phrases for free.
    anchor_min_candidate_postings: int = 200_000

    def _phrase_anchor(self, phrases, pos):
        """Rarest-term-first phrase pruning (VERDICT r4 item 3): pick each
        phrase's lowest-df INDEXABLE term as its anchor (df is driver-side
        via the same dictionary lookup that feeds search_local's guard —
        stopwords are excluded because they are absent from the dictionary
        yet corpus-scale in the positions table, so their df=0 would
        masquerade as "rarest"), and build the per-pid anchor doc sets
        from the already-pruned positional scan. The matching core then
        broadcast-semi-joins candidate starts on (pid, doc_id) BEFORE the
        one hash Exchange — "state of the art" shuffles the positions of
        "of"/"the" only for docs containing "art", bounding the shuffle by
        the rare term's postings instead of the corpus (the same
        rarest-first trick WAND's pruning embodies).

        An anchor with df=0 (a non-stopword term absent from the corpus)
        yields an EMPTY doc set — the semi-join then correctly kills the
        unmatchable phrase before it moves any data. Returns
        (anchor_docs, anchored_pids, all_anchored) or None when no phrase
        is anchorable (single-term or all-stopword phrases)."""
        from colbert_jl_spark.functions.tokenizer import py_tokens

        idx_stopwords = set(self.plan["config"].get("stopwords", ()))
        anchors: list[tuple[int, str]] = []
        pids = set()
        for pid, text in phrases:
            toks = py_tokens(text, None)
            pids.add(int(pid))
            indexable = sorted(set(toks) - idx_stopwords)
            if not indexable or len(set(toks)) < 2:
                continue  # nothing to prune by / pruning is a no-op
            self._ensure_term_stats(indexable)
            dfs = {t: self._term_stats[t][0] for t in indexable}
            anchor_term = min(indexable, key=lambda t: (dfs[t], t))
            has_stopword = any(t in idx_stopwords for t in toks)
            worth_it = (
                dfs[anchor_term] == 0  # provably unmatchable — free kill
                or has_stopword  # volume invisible to the df estimate
                or sum(dfs.values()) > self.anchor_min_candidate_postings
            )
            if worth_it and dfs[anchor_term] <= self.max_anchor_df:
                anchors.append((int(pid), anchor_term))
        if not anchors:
            return None
        at = local_df(self.spark, anchors, "pid long, term string")
        # positions hold ONE row per (term, doc_id) and each pid has ONE
        # anchor term, so this is already distinct — no extra exchange
        anchor_docs = pos.join(F.broadcast(at), "term").select("pid", "doc_id")
        anchored_pids = sorted(p for p, _ in anchors)
        return anchor_docs, anchored_pids, len(anchored_pids) == len(pids)

    def phrase_local(self, phrases: list[tuple[int, str]]) -> DataFrame:
        """Latency-mode phrase matching — the phrase analogue of
        search_local: ONE data-path action (the term/bucket-pruned
        positional fetch collected to the driver), then the identical
        start-offset matching runs in pandas. Output-identical to
        phrase() (gated in tests/test_phrase.py).

        Size guard: the dictionary df of the phrase's INDEXABLE terms
        estimates the collect volume exactly like search_local. Stopword
        terms are absent from the dictionary (they are stoplisted out of
        postings) yet present in the POSITIONS table with corpus-scale
        frequency — a phrase containing one would collect an unbounded
        slice the guard cannot see, so any stopword-bearing (or
        unestimable) phrase transparently routes to the distributed
        phrase()."""
        import pandas as pd

        from colbert_jl_spark.functions.hashing import spark_pmod_hash
        from colbert_jl_spark.functions.tokenizer import py_tokens

        self.refresh()
        if not self.plan.get("positions"):
            raise RuntimeError(
                "this index has no positions stage — run "
                "IndexBuilder.build_positions(docs) once, or use the "
                "inline operators/phrase.phrase_matches(docs, phrases)"
            )
        terms = sorted(
            {t for _, text in phrases for t in py_tokens(text, None)}
        )
        out_schema = "pid long, doc_id long, n_occurrences long"
        if not terms:
            return local_df(self.spark, [], out_schema)
        # the INDEX's persisted stoplist, not self.cfg (the constructor
        # allows a caller-supplied cfg whose stoplist may differ — a term
        # stoplisted AT INDEX TIME has df=0 in the dictionary yet
        # corpus-scale volume in the positions table, which would blind
        # the Σdf guard below)
        idx_stopwords = set(self.plan["config"].get("stopwords", ()))
        if any(t in idx_stopwords for t in terms):
            return self.phrase(phrases)
        self._ensure_term_stats(terms)
        if (
            sum(self._term_stats[t][0] for t in terms)
            > self.max_local_postings
        ):
            return self.phrase(phrases)

        pos = getattr(self, "_hot_positions", None)
        if pos is None:
            pos = self._stage_df("positions_dir", "positions")
        pos = pos.where(F.col("term").isin(terms))
        tp = self.plan.get("term_partitions")
        if tp:
            buckets = sorted({spark_pmod_hash(t, tp) for t in terms})
            pos = pos.where(F.col("term_bucket").isin(buckets))
        ppdf = pos.select("term", "doc_id", "positions").toPandas()  # THE action

        pt = pd.DataFrame(
            [
                (int(pid), t, off, len(toks))
                for pid, text in phrases
                for toks in [py_tokens(text, None)]
                for off, t in enumerate(toks)
            ],
            columns=["pid", "term", "off", "plen"],
        )
        if not len(ppdf) or not len(pt):
            return local_df(self.spark, [], out_schema)
        ex = ppdf.explode("positions").rename(columns={"positions": "pos"})
        m = ex.merge(pt, on="term")
        m["start"] = m["pos"].astype("int64") - m["off"]
        m = m[m["start"] >= 0]
        if not len(m):
            return local_df(self.spark, [], out_schema)
        g = (
            m.groupby(["pid", "plen", "doc_id", "start"])
            .size()
            .reset_index(name="m")
        )
        g = g[g["m"] == g["plen"]]
        out = (
            g.groupby(["pid", "doc_id"]).size().reset_index(name="n_occurrences")
        )
        return local_df(
            self.spark,
            [
                (int(r.pid), int(r.doc_id), int(r.n_occurrences))
                for r in out.itertuples()
            ],
            out_schema,
        )

    def load_hot(self) -> "IndexReader":
        """Serving mode: pin the block table in executor memory so repeated
        queries skip the parquet scan — the closest analogue of the
        reference Searcher holding the whole index in RAM
        (reference src/loaders.jl:91-113), but distributed and optional.

        The pin is hash-partitioned by ``bucket`` (the doc-range WAND
        group key): HashPartitioning(bucket) satisfies the executors'
        ClusteredDistribution for both (qid, bucket) and the single-query
        bucket-only grouping, so a single-query search() DAG over a hot
        reader needs NO Exchange at all — scan → literal attach → local
        sort → FlatMapGroupsInPandas, one stage (multi-query calls keep
        the (qid, bucket) exchange: one task per bucket would serialize a
        batched suite's groups). The repartition runs once, at pin time —
        never on the per-query path."""
        if not hasattr(self, "_hot_blocks"):
            b = self.blocks.repartition("bucket").cache()
            b.count()  # materialize
            self._hot_blocks = b
        # pin the positions stage too when present: a hot phrase query
        # otherwise pays the positional parquet scan (file listing +
        # footers) on every call — serving mode assumes the index fits
        # the cluster's cache tier, exactly like the blocks pin
        if self.plan.get("positions") and not hasattr(self, "_hot_positions"):
            pos = self._stage_df("positions_dir", "positions").cache()
            pos.count()  # materialize
            self._hot_positions = pos
        return self

    @property
    def blocks(self) -> DataFrame:
        """Resolved via plan.json's ``blocks_dir`` (default "blocks"):
        minor compaction commits a versioned ``blocks.v{k}`` dir and
        repoints the plan — refresh() picks the new version up on the
        next search."""
        if hasattr(self, "_hot_blocks"):
            return self._hot_blocks
        return self._stage_df("blocks_dir", "blocks")

    def _bucket_file_counts(self, stage_dir: str) -> dict[int, int]:
        """Per-``term_bucket=N`` partition data-file counts for a stage dir
        (driver-side listdir: bucket count is plan.term_partitions ≤ 4096,
        not data-scale — cheap even on a 100 TB index)."""
        counts: dict[int, int] = {}
        if not os.path.isdir(stage_dir):
            return counts
        for entry in os.listdir(stage_dir):
            if entry.startswith("term_bucket="):
                d = os.path.join(stage_dir, entry)
                counts[int(entry.split("=", 1)[1])] = sum(
                    1 for f in os.listdir(d) if f.startswith("part-")
                )
        return counts

    def validate(self, max_files_per_bucket: int | None = None) -> dict:
        """Cross-stage invariants — the _check_all_files_are_saved analogue
        (reference collection_indexer.jl:299-340 + loaders.jl:85-87).

        Also surfaces the SMALL-FILE invariant the compaction passes
        maintain (VERDICT r5 item 5): incremental epochs append one file
        per term_bucket per wave to the blocks/positions stages, and
        minor_compact / compact_positions bound that; a long-lived
        streamed index that drifted past the ceiling (compaction never
        scheduled, or a crashed pass) is flagged HERE at serve time, not
        only in pytest. The ceiling defaults to plan's
        ``max_files_per_bucket`` if recorded, else
        ``FILES_PER_BUCKET_CEILING`` (compaction policy default 4 + slack
        for a few uncompacted epochs)."""
        stages = _load_stages(self.index_path)
        missing = [s for s in STAGES if s not in stages]
        dic_postings = self.dictionary.agg(F.sum("df")).first()[0]
        blk_postings = self.blocks.agg(F.sum("n_docs")).first()[0]
        n_docs = self.docstats.count()
        total_tokens = self.docstats.agg(F.sum("doclen")).first()[0]
        report = {
            "missing_stages": missing,
            "dictionary_postings": dic_postings,
            "block_postings": blk_postings,
            "postings_match": dic_postings == blk_postings,
            "n_docs": n_docs,
            # docstats holds only docs with ≥1 indexable token; all-stopword
            # docs are carried as plan.n_empty_docs (kept out of the table,
            # in N/avgdl)
            "n_docs_match": n_docs + self.plan.get("n_empty_docs", 0)
            == self.plan["n_docs"],
            "total_tokens_match": total_tokens == self.plan["total_tokens"],
        }
        ceiling = (
            max_files_per_bucket
            if max_files_per_bucket is not None
            else self.plan.get("max_files_per_bucket", FILES_PER_BUCKET_CEILING)
        )
        blk_counts = self._bucket_file_counts(
            self._stage_dir("blocks_dir", "blocks")
        )
        dic_counts = self._bucket_file_counts(
            self._stage_dir("dictionary_dir", "dictionary")
        )
        report["max_files_per_bucket"] = ceiling
        report["blocks_files_per_bucket_max"] = max(blk_counts.values(), default=0)
        report["dictionary_files_per_bucket_max"] = max(
            dic_counts.values(), default=0
        )
        frag_ok = (
            report["blocks_files_per_bucket_max"] <= ceiling
            and report["dictionary_files_per_bucket_max"] <= ceiling
        )
        if self.plan.get("positions"):
            pos_counts = self._bucket_file_counts(
                self._stage_dir("positions_dir", "positions")
            )
            report["positions_files_per_bucket_max"] = max(
                pos_counts.values(), default=0
            )
            frag_ok = frag_ok and report["positions_files_per_bucket_max"] <= ceiling
        report["fragmentation_ok"] = frag_ok
        report["ok"] = (
            not missing
            and report["postings_match"]
            and report["n_docs_match"]
            and report["total_tokens_match"]
            and frag_ok
        )
        return report
