"""df_cap on the exact containment family (VERDICT r8 #3).

Two pins per operator:
1. NOOP: capped == uncapped (exact row equality) on a corpus whose
   max posting-list length is below the cap — the registered
   (uncapped) oracle therefore keeps covering the capped code path's
   correctness on ordinary corpora.
2. CUT: on a corpus with a boilerplate cluster (COPIES of one page,
   the license-header regime), a cap below the cluster size removes
   the cluster's codes/buckets from the join, so its pairs — present
   uncapped with containment 1.0 — vanish, while pairs among ordinary
   documents are untouched. Output-level proof the knob cuts exactly
   the df^2 work it targets.

The wall-clock ratio pin (capped <= uncapped under the hot prefix at
10x) lives in test_scale_stress.py::test_10x_containment_skew_bounded.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mvrs_dspa_spark.operators.dedup import (
    dedup_containment,
    minhash_containment_join,
)

SF = "/root/testdata/sf0.001"

N_COPIES = 40  # boilerplate cluster: identical copies of one page
N_TAIL = 200


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _write_copy_cluster(spark, out_dir: str) -> None:
    """N_COPIES byte-identical docs (ids 0..N_COPIES-1) + N_TAIL
    distinct docs. Every shingle of the copied page has df >=
    N_COPIES; the distinct tail's codes have df ~ 1."""
    os.makedirs(out_dir, exist_ok=True)
    page = " ".join(f"licenseword{i:03d}" for i in range(40))
    word = lambda i: F.concat(  # noqa: E731
        F.lit("w"),
        F.conv(
            F.abs(F.xxhash64(F.col("id"), F.lit(i))) % 99991, 10, 36
        ),
    )
    tail_text = F.concat_ws(" ", *[word(i) for i in range(40)])
    text = F.when(F.col("id") < N_COPIES, F.lit(page)).otherwise(tail_text)
    (
        spark.range(0, N_COPIES + N_TAIL, 1, 8)
        .select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            F.lit("en").alias("lang"),
            F.lit("synthetic").alias("source"),
            F.length(text).cast("long").alias("n_chars"),
        )
        .write.mode("overwrite")
        .parquet(f"{out_dir}/documents.parquet")
    )


@pytest.mark.parametrize(
    "fn", [dedup_containment, minhash_containment_join]
)
def test_df_cap_noop_below_max_df(spark, fn):
    # sf0.001's synthetic docs have no corpus-wide boilerplate; a cap
    # far above any real posting list must leave the result unchanged.
    assert _rows(fn(spark, SF, df_cap=10**6)) == _rows(fn(spark, SF))


def _cluster_pairs(df):
    return df.where(
        (F.col("doc_a") < N_COPIES) & (F.col("doc_b") < N_COPIES)
    ).count()


def _tail_rows(df):
    return _rows(df.where(F.col("doc_a") >= N_COPIES))


@pytest.mark.parametrize(
    "fn", [dedup_containment, minhash_containment_join]
)
def test_df_cap_cuts_copy_cluster_only(spark, tmp_path, fn):
    sf = str(tmp_path / "copies")
    _write_copy_cluster(spark, sf)
    uncapped = fn(spark, sf)
    capped = fn(spark, sf, df_cap=N_COPIES // 2)
    # uncapped: every copy pair is a containment-1.0 pair
    assert _cluster_pairs(uncapped) == N_COPIES * (N_COPIES - 1) // 2
    # capped: the cluster's codes/buckets all exceed the cap -> its
    # pairs vanish; that IS the df^2 work the cap exists to cut
    assert _cluster_pairs(capped) == 0
    # ...and pairs among ordinary documents are byte-identical
    assert _tail_rows(capped) == _tail_rows(uncapped)
