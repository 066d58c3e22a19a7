"""Ad-hoc query runner CLI: execute any registered query by name.

    python -m mvrs_dspa_spark.run q1_pricing_summary \\
        --sf-dir /root/testdata/sf0.01 --show 10
    python -m mvrs_dspa_spark.run dedup_minhash_lsh --out /tmp/pairs
    python -m mvrs_dspa_spark.run --list
    python -m mvrs_dspa_spark.run --list --tag llm

The batch complement of the streaming job runner (jobs.py): the full
registered surface (SURVEY §2) becomes runnable without writing a
line of Python — list, filter by tag, execute, show or write parquet,
optionally print the physical plan (--explain) the way the scale
posture docs recommend reviewing every operator.
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m mvrs_dspa_spark.run",
        description=__doc__.split("\n\n")[0],
    )
    p.add_argument("query", nargs="?", help="registered query name")
    p.add_argument("--list", action="store_true", help="list queries")
    p.add_argument("--tag", default=None, help="filter --list by tag")
    p.add_argument(
        "--sf-dir",
        default=None,
        help="table directory (default: settings.data.tables_directory)",
    )
    p.add_argument("--out", default=None, help="write result parquet here")
    p.add_argument("--show", type=int, default=20, help="rows to print")
    p.add_argument(
        "--explain", action="store_true", help="print the physical plan"
    )
    return p


def run(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from mvrs_dspa_spark.config import settings
    from mvrs_dspa_spark.plans.registry import all_queries

    registry = all_queries()

    if args.list:
        for name, spec in registry.items():
            if args.tag and args.tag not in spec.tags:
                continue
            gate = "oracle" if spec.oracle else "rows"
            print(f"{name}\t[{gate}]\t{','.join(spec.tags)}")
        return 0

    if not args.query:
        print("error: query name required (or --list)", file=sys.stderr)
        return 2
    spec = registry.get(args.query)
    if spec is None:
        import difflib

        near = difflib.get_close_matches(args.query, registry, n=3)
        print(
            f"error: unknown query {args.query!r}"
            + (f"; did you mean: {', '.join(near)}?" if near else ""),
            file=sys.stderr,
        )
        return 2

    from mvrs_dspa_spark.session import get_spark

    spark = get_spark(app_name=f"mvrs-run-{args.query}")
    sf_dir = args.sf_dir or settings.data.tables_directory
    df = spec.fn(spark, sf_dir)
    if args.explain:
        df.explain("formatted")
    t0 = time.perf_counter()
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(f"{args.query}: {n} rows -> {args.out} "
              f"({time.perf_counter() - t0:.2f}s)")
    else:
        df.show(args.show, truncate=False)
        print(f"{args.query}: shown {args.show} ({time.perf_counter() - t0:.2f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(run())
