"""Round-7 optimization measurement harness (NOT the driver contract —
bench.py stays frozen; this file exists so guide §1.4 noop-sink isolation
and per-call micro-costs can be measured without touching the graded
methodology).

Modes:
  python bench_extra.py build <index_dir>        # build sf0.1 index (+positions)
  python bench_extra.py serve <index_dir>        # pinned serve-regime micro-bench
  python bench_extra.py plans <index_dir> <out>  # explain("formatted") per query
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SERVE_CORES = int(os.environ.get("BENCH_SERVE_CORES", "8"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _serve_spark():
    from colbert_jl_spark.session import get_spark

    return get_spark(
        "bench_extra", master=f"local[{SERVE_CORES}]",
        shuffle_partitions=SERVE_CORES,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )


def build(index_dir: str) -> None:
    from colbert_jl_spark.config import EngineConfig
    from colbert_jl_spark.plans.build import IndexBuilder
    from colbert_jl_spark.session import get_spark

    spark = get_spark("bench_extra_build")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t0 = time.perf_counter()
    IndexBuilder(index_dir, EngineConfig()).build(docs, force=True)
    log(f"build: {time.perf_counter() - t0:.2f}s")
    IndexBuilder(index_dir, EngineConfig()).build_positions(docs)
    spark.stop()


def _jobs_for(spark, tag: str, fn):
    """Run fn under a job group; return (wall_sec, n_jobs, n_stages)."""
    sc = spark.sparkContext
    sc.setJobGroup(tag, tag)
    t0 = time.perf_counter()
    fn()
    wall = time.perf_counter() - t0
    sc.setJobGroup("", "")
    tracker = sc.statusTracker()
    jids = tracker.getJobIdsForGroup(tag)
    n_stages = 0
    for j in jids:
        info = tracker.getJobInfo(j)
        if info:
            n_stages += len(info.stageIds)
    return wall, len(jids), n_stages


def serve(index_dir: str) -> None:
    from colbert_jl_spark.plans.build import IndexReader
    from colbert_jl_spark.queries import QUERY_SET, queries_df

    spark = _serve_spark()
    reader = IndexReader(spark, index_dir)
    reader.load_hot()
    q = queries_df(spark)
    reader.search(q).collect()
    reader.search_local(q).collect()

    out: dict = {}

    # micro-costs of the per-call pieces
    def t(fn, n=7):
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return round(min(times), 4)

    out["empty_df_collect"] = t(
        lambda: spark.createDataFrame(
            [], "qid long, rank int, doc_id long, score double"
        ).collect()
    )
    qt_rows = [(0, "spark", 1), (0, "table", 1), (0, "join", 1)]
    out["qt_df_collect"] = t(
        lambda: spark.createDataFrame(
            qt_rows, "qid long, term string, qtf long"
        ).collect()
    )
    import pandas as pd

    out["qt_pandas_df_collect"] = t(
        lambda: spark.createDataFrame(
            pd.DataFrame(qt_rows, columns=["qid", "term", "qtf"]),
            "qid long, term string, qtf long",
        ).collect()
    )

    # per-query: wall + job/stage counts under the serve regime
    per_query = {}
    for qid, qtext in QUERY_SET:
        reader.search([(qid, qtext)]).collect()  # warm
        wall, nj, ns = _jobs_for(
            spark, f"q{qid}", lambda: reader.search([(qid, qtext)]).collect()
        )
        # min-of-5 wall like bench
        walls = [wall]
        for _ in range(4):
            w2, _, _ = _jobs_for(
                spark, f"q{qid}x", lambda: reader.search([(qid, qtext)]).collect()
            )
            walls.append(w2)
        per_query[f"q{qid}"] = {
            "sec": round(min(walls), 4), "jobs": nj, "stages": ns,
        }
    out["per_query"] = per_query

    # batched suite
    reader.search(q).collect()
    wall, nj, ns = _jobs_for(spark, "batched", lambda: reader.search(q).collect())
    walls = [wall] + [
        _jobs_for(spark, "batchedx", lambda: reader.search(q).collect())[0]
        for _ in range(4)
    ]
    out["batched"] = {"sec": round(min(walls), 4), "jobs": nj, "stages": ns}

    # search_local per query for contrast
    pl = {}
    for qid, qtext in QUERY_SET:
        reader.search_local([(qid, qtext)]).collect()
        pl[f"q{qid}"] = t(
            lambda qid=qid, qtext=qtext: reader.search_local(
                [(qid, qtext)]
            ).collect(),
            n=5,
        )
    out["per_query_local"] = pl
    print(json.dumps(out, indent=2))
    spark.stop()


def plans(index_dir: str, out_dir: str) -> None:
    from colbert_jl_spark.plans.build import IndexReader
    from colbert_jl_spark.queries import QUERY_SET

    os.makedirs(out_dir, exist_ok=True)
    spark = _serve_spark()
    reader = IndexReader(spark, index_dir)
    reader.load_hot()
    for qid, qtext in QUERY_SET:
        df = reader.search([(qid, qtext)])
        with open(os.path.join(out_dir, f"q{qid}.txt"), "w") as f:
            f.write(f"-- query {qid}: {qtext!r}\n")
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "build":
        build(sys.argv[2])
    elif mode == "serve":
        serve(sys.argv[2])
    elif mode == "plans":
        plans(sys.argv[2], sys.argv[3])
