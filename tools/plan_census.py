#!/usr/bin/env python3
"""Plan-shape census over every registered query: from explain output
only (no execution), count per-base-table parquet scans, Exchanges,
joins, and Python-boundary nodes. Queries that scan a base table more
than expected are duplicate-subtree candidates (guide §2.4); any
BatchEvalPython is a §4 violation.

Usage: python tools/plan_census.py [--sf DIR] [--out CSV] [names...]
"""
from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvrs_dspa_spark.plans.registry import queries  # noqa: E402
from mvrs_dspa_spark.session import get_spark  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings", "media")

NODES = ("Exchange", "BroadcastHashJoin", "SortMergeJoin",
         "ShuffledHashJoin", "BroadcastNestedLoopJoin",
         "BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas",
         "MapInPandas", "MapInArrow", "Window", "Generate")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="plan_census", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()
    names = args.names or sorted(q.keys())
    out = open(args.out, "w") if args.out else sys.stdout
    print("query," + ",".join(f"scan_{t}" for t in TABLES) + ","
          + ",".join(NODES), file=out)
    for name in names:
        try:
            df = q[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as ex:  # noqa: BLE001
            print(f"{name},ERROR:{type(ex).__name__}", file=out, flush=True)
            continue
        scans: dict[str, int] = {t: 0 for t in TABLES}
        for m in re.finditer(r"Scan parquet[^\n]*?(\w+)\.parquet", plan):
            t = m.group(1)
            if t in scans:
                scans[t] += 1
        # fallback: location lines
        if sum(scans.values()) == 0:
            for m in re.finditer(r"file:[^\n]*?/(\w+)\.parquet", plan):
                t = m.group(1)
                if t in scans:
                    scans[t] += 1
        counts = [len(re.findall(r"\b" + n, plan)) for n in NODES]
        print(name + "," + ",".join(str(scans[t]) for t in TABLES) + ","
              + ",".join(str(c) for c in counts), file=out, flush=True)
    if args.out:
        out.close()


if __name__ == "__main__":
    main()
