"""Round-7 guide-§1 measurement: every declared query in __spark_entry__
timed against the noop sink (computation only, no sink cost), with plan
shape stats (Exchange count, Python-eval nodes, scan pushdown evidence).

Usage: python scripts/measure_queries_r07.py [sf_dir] [out_json] [plans_dir]

NOT part of the driver contract — bench.py stays frozen (guide §1.4 says
isolate with noop in a separate harness).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/measure_queries_r07.json"
PLANS_DIR = sys.argv[3] if len(sys.argv) > 3 else ""


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def plan_stats(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan))
        - len(re.findall(r"\bBroadcastExchange\b", plan)),
        "broadcast_exchanges": len(re.findall(r"\bBroadcastExchange\b", plan)),
        "python_eval": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython", plan)
        ),
        "map_in_pandas": len(
            re.findall(r"FlatMapGroupsInPandas|MapInPandas|MapInArrow", plan)
        ),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "cartesian": len(
            re.findall(r"CartesianProduct|BroadcastNestedLoopJoin", plan)
        ),
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
    }


def main() -> None:
    import __spark_entry__ as e
    from colbert_jl_spark.session import get_spark

    spark = get_spark(
        "measure_r07", master="local[32]", shuffle_partitions=32
    )
    sc = spark.sparkContext
    out: dict = {"sf": SF_DIR}
    rows = {}
    for name, fn in e.queries().items():
        sc.setJobDescription(f"measure:{name}")
        times = []
        plan = None
        for rep in range(3):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            if plan is None:
                plan = formatted_plan(df)
        rows[name] = {
            "noop_sec_best": round(min(times), 3),
            "noop_sec_reps": [round(t, 3) for t in times],
            **plan_stats(plan),
        }
        if PLANS_DIR:
            os.makedirs(PLANS_DIR, exist_ok=True)
            with open(os.path.join(PLANS_DIR, f"{name}.txt"), "w") as f:
                f.write(plan)
        print(f"{name}: {rows[name]}", file=sys.stderr, flush=True)
        sc.setJobDescription(None)
    out["queries"] = rows
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(json.dumps({k: v["noop_sec_best"] for k, v in rows.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
