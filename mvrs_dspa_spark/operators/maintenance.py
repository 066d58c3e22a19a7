"""Table maintenance: small-file compaction + range clustering.

The chronic failure mode of a long-running 100 TB lake is file-count
explosion — every micro-batch commit and every over-parallel write
adds files, and scan planning cost grows linearly with file count
(listing, footer reads, task scheduling). `compact_parquet` is the
OPTIMIZE analog: rewrite a directory into ~target-size files, sized
from the on-disk bytes via the Hadoop FileSystem API (metadata only,
no data scan), optionally range-clustered on chosen columns.

Clustering uses `repartitionByRange` + `sortWithinPartitions`: output
files then carry narrow, near-disjoint min/max ranges on the cluster
columns in their parquet footers, so any engine's row-group/file
pruning (including Spark's parquet filter pushdown) can skip most of
the table for selective predicates — the single-dimension version of
Z-ordering, which is the right choice when one column dominates the
filter workload (typically event time).

Reference parity: the reference's ES indexes are rebuilt per run
(`db/*Index.scala` recreate-on-start); a lakehouse engine needs the
in-place equivalent.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def _dir_bytes(spark: SparkSession, path: str) -> int:
    """Recursive byte size via the Hadoop FS API (works on any scheme)."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    cluster_by: list[str] | None = None,
    mode: str = "error",
) -> int:
    """Rewrite `in_path` into `out_path` as ~target-size parquet files.

    Returns the number of output partitions chosen. With `cluster_by`,
    rows are range-partitioned and sorted on those columns so each
    output file covers a narrow value range (file/row-group pruning).
    """
    df = spark.read.parquet(in_path)
    n = max(1, math.ceil(_dir_bytes(spark, in_path) / target_file_bytes))
    if cluster_by:
        from pyspark.sql import functions as F

        cols = [F.col(c) for c in cluster_by]
        out = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
    else:
        out = df.repartition(n)
    out.write.mode(mode).parquet(out_path)
    return n
