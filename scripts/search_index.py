#!/usr/bin/env python
"""Query entrypoint — run via spark-submit against a built index:

    spark-submit --py-files colbert_jl_spark.zip scripts/search_index.py \
        --index <index root> --query "spark table join" [--k 10] [--mode intersect]

Prints one JSON line per hit: {"rank": r, "doc_id": d, "score": s}.
The analogue of the reference's Searcher/search round trip
(reference src/searching.jl:18-128).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True, action="append",
                    help="repeatable; each becomes one qid")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", choices=("topk", "intersect", "phrase"), default="topk",
                    help="topk = disjunctive block-max WAND; intersect = "
                         "conjunctive (docs must contain every query term); "
                         "phrase = exact consecutive-token matching from the "
                         "persisted positions stage (IndexReader.phrase)")
    ap.add_argument("--local-merge", action="store_true",
                    help="interactive latency mode: one pruned collect, WAND "
                         "runs driver-side (IndexReader.search_local)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from colbert_jl_spark.plans.build import IndexReader
    from colbert_jl_spark.session import get_spark

    spark = get_spark("colbert-search", master=args.master)
    schema = StructType(
        [StructField("qid", LongType()), StructField("query", StringType())]
    )
    q = spark.createDataFrame(list(enumerate(args.query)), schema)
    reader = IndexReader(spark, args.index)
    if args.mode == "phrase":
        run_p = reader.phrase_local if args.local_merge else reader.phrase
        out = run_p(list(enumerate(args.query)))
        for row in out.orderBy("pid", "doc_id").collect():
            print(json.dumps(
                {"pid": row.pid, "doc_id": row.doc_id,
                 "n_occurrences": row.n_occurrences}
            ))
        spark.stop()
        return 0
    run = reader.search_local if args.local_merge else reader.search
    for row in run(q, args.k, mode=args.mode).orderBy("qid", "rank").collect():
        print(json.dumps(
            {"qid": row.qid, "rank": row.rank, "doc_id": row.doc_id, "score": row.score}
        ))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
