"""Compaction: file-count reduction, data fidelity, range clustering."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from mvrs_dspa_spark.operators.maintenance import compact_parquet
from mvrs_dspa_spark.tables import table


def _parquet_files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "part-*.parquet")))


def test_compact_reduces_file_count_preserving_data(spark, sf_small, tmp_path):
    ev = table(spark, sf_small, "events")
    frag = str(tmp_path / "fragmented")
    ev.repartition(64).write.parquet(frag)  # simulate micro-batch litter
    assert len(_parquet_files(frag)) == 64

    out = str(tmp_path / "compacted")
    n = compact_parquet(spark, frag, out, target_file_bytes=64 * 1024 * 1024)
    files = _parquet_files(out)
    assert len(files) == n <= 4
    # lossless: same multiset of rows
    a = spark.read.parquet(frag)
    b = spark.read.parquet(out)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_compact_cluster_by_produces_disjoint_ranges(spark, sf_small, tmp_path):
    ev = table(spark, sf_small, "events")
    frag = str(tmp_path / "frag2")
    ev.repartition(16).write.parquet(frag)
    out = str(tmp_path / "clustered")
    # tiny target -> several files, each covering a narrow user_id range
    n = compact_parquet(
        spark, frag, out, target_file_bytes=8 * 1024, cluster_by=["user_id"]
    )
    files = _parquet_files(out)
    assert len(files) > 1
    ranges = []
    for f in files:
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "user_id"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    ranges.sort()
    # range clustering: file value ranges must not interleave (allow the
    # boundary value to be shared between adjacent files)
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges
