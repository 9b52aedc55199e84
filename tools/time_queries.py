#!/usr/bin/env python
"""Same-session per-query timing harness for optimization A/Bs.

Times the named registry queries exactly the way bench.py does (collect()
as the action, full cache reset between reps — windows + dedup +
clustering + graph, the r15 discipline), printing per-query medians over
REPS steady reps after discarding WARM warmup reps.  Optional session
confs can be set before timing (runtime-mutable only) via --conf k=v.

Usage:
  python tools/time_queries.py [--reps 7] [--warm 2] [--conf k=v ...] q1 q2 ...
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from intellect_bi_spark.registry import QUERIES  # noqa: E402
from intellect_bi_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_queries")
    for kv in args.conf:
        k, v = kv.split("=", 1)
        spark.conf.set(k, v)

    from intellect_bi_spark.functions import windows
    from intellect_bi_spark.operators import clustering, dedup, graph

    def _reset() -> None:
        dedup.reset_caches()
        windows.reset_caches()
        clustering.reset_caches()
        graph.reset_caches()

    names = args.queries
    for n in names:
        if n not in QUERIES:
            raise SystemExit(f"unknown query: {n}")

    all_reps: list[dict[str, float]] = []
    for rep in range(args.reps):
        _reset()
        t: dict[str, float] = {}
        for n in names:
            spark.sparkContext.setJobDescription(f"time_queries:{n}")
            t0 = time.perf_counter()
            QUERIES[n](spark, sf_dir).collect()
            t[n] = round(time.perf_counter() - t0, 4)
            spark.sparkContext.setJobDescription(None)
        all_reps.append(t)
        spark.streams.resetTerminated()
        print(f"rep {rep}: " + json.dumps(t), flush=True)
    steady = all_reps[min(args.warm, len(all_reps) - 1):]
    med = {
        n: round(statistics.median(r[n] for r in steady), 4) for n in names
    }
    print("MEDIANS " + json.dumps(med))


if __name__ == "__main__":
    main()
