#!/usr/bin/env python3
"""Profile one or more registered queries: capture explain('formatted'),
time count() and noop-sink executions (steady-state min-of-3), and
summarize plan shape (Exchange count, join strategies, Python nodes).

Usage: python tools/profile_query.py [--plans-out DIR] [--sf DIR] name...
"""
from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvrs_dspa_spark.plans.registry import queries  # noqa: E402
from mvrs_dspa_spark.session import get_spark  # noqa: E402


def plan_shape(plan: str) -> str:
    counts = {}
    for pat in ("Exchange", "BroadcastHashJoin", "SortMergeJoin",
                "ShuffledHashJoin", "BroadcastNestedLoopJoin", "Sort ",
                "BatchEvalPython", "ArrowEvalPython", "MapInArrow",
                "FlatMapGroupsInPandas", "MapInPandas", "Window",
                "HashAggregate", "ObjectHashAggregate", "SortAggregate",
                "Scan parquet"):
        n = len(re.findall(r"\b" + pat.strip(), plan))
        if n:
            counts[pat.strip()] = n
    return ", ".join(f"{k}={v}" for k, v in counts.items())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--plans-out", default=None,
                    help="write <name>_<suffix>.txt explain dumps here")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-noop", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="profile")
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()
    for name in args.names:
        df = q[name](spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        if args.plans_out:
            os.makedirs(args.plans_out, exist_ok=True)
            with open(os.path.join(args.plans_out,
                                   f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # warm
        q[name](spark, args.sf).count()
        tc = []
        for _ in range(args.runs):
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            q[name](spark, args.sf).count()
            tc.append(time.perf_counter() - t0)
        tn = []
        if not args.no_noop:
            q[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            for _ in range(args.runs):
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                q[name](spark, args.sf).write.format("noop").mode(
                    "overwrite").save()
                tn.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: count_min={min(tc):.3f} "
              + (f"noop_min={min(tn):.3f} " if tn else "")
              + f"| {plan_shape(plan)}", flush=True)


if __name__ == "__main__":
    main()
