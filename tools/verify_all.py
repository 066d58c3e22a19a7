#!/usr/bin/env python3
"""Full driver-contract sweep: entry smoke + every oracle query compared
value-level against DuckDB at sf0.01 via tests/oracle_harness.compare.

Usage: python tools/verify_all.py [names...]   (default: all oracle queries)
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    import __spark_entry__ as e
    from mvrs_dspa_spark.session import get_spark
    from oracle_harness import compare

    spark = get_spark(app_name="verify_all", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = e.entry(spark).collect()
    print(f"entry rows: {len(rows)}", flush=True)

    names = sys.argv[1:] or sorted(e.oracle_sql().keys())
    t0 = time.time()
    bad = []
    for i, name in enumerate(names, 1):
        try:
            compare(spark, SF_DIR, name)
            ok, msg = True, ""
        except AssertionError as ex:
            ok, msg = False, f"MISMATCH: {str(ex)[:300]}"
        except Exception as ex:  # noqa: BLE001
            ok, msg = False, f"ERROR {type(ex).__name__}: {str(ex)[:300]}"
        tag = "OK" if ok else "FAIL"
        print(f"[{i}/{len(names)}] {name}: {tag} {'' if ok else msg}",
              flush=True)
        if not ok:
            bad.append((name, msg))
    dt = time.time() - t0
    print(f"done: {len(names) - len(bad)}/{len(names)} pass in {dt:.0f}s",
          flush=True)
    for name, msg in bad:
        print(f"FAIL {name}: {msg}", flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
