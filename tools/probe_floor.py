#!/usr/bin/env python
"""Probe: the irreducible per-query driver floor at local[N] (VERDICT r15
round-16 ask #3 — "measure an empty-plan collect floor once, report what
is irreducible").

Times, medians of N reps each:
  - empty_collect:  spark.range(1).collect()          (pure Py4J + scheduling)
  - tiny_agg:       spark.range(1000).groupBy((col%7)).count().collect()
                    (one exchange; AQE coalesce behaviour visible)
  - tiny_agg_sorted: + orderBy (second exchange)
  - local_ckpt:     spark.range(1000).localCheckpoint(eager).count()
                    (the pin-lifecycle action many queries pay)
Optionally A/Bs AQE coalesce knobs via --conf k=v.
"""
from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from intellect_bi_spark.session import get_spark  # noqa: E402


def t(fn, reps):
    xs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        xs.append(time.perf_counter() - t0)
    return round(statistics.median(xs), 4), [round(x, 4) for x in xs]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=9)
    ap.add_argument("--conf", action="append", default=[])
    args = ap.parse_args()
    spark = get_spark("probe_floor")
    for kv in args.conf:
        k, v = kv.split("=", 1)
        spark.conf.set(k, v)
    from pyspark.sql import functions as F

    # warm
    spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count().collect()

    cases = {
        "empty_collect": lambda: spark.range(1).collect(),
        "tiny_agg": lambda: spark.range(1000)
        .groupBy((F.col("id") % 7).alias("k"))
        .count()
        .collect(),
        "tiny_agg_sorted": lambda: spark.range(1000)
        .groupBy((F.col("id") % 7).alias("k"))
        .count()
        .orderBy("k")
        .collect(),
        "local_ckpt": lambda: spark.range(1000)
        .localCheckpoint(eager=True)
        .count(),
    }
    for name, fn in cases.items():
        med, xs = t(fn, args.reps)
        print(f"{name}: median {med}s  all {xs}")


if __name__ == "__main__":
    main()
