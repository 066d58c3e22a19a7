"""DSIR importance-weight selection pins (#121): the selected set must
actually be enriched for the target domain — the property the oracle
twin can't distinguish from a shared sign error — plus rank/ordering
invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from mvrs_dspa_spark.operators.sampling import (
    DSIR_TARGET_SOURCE,
    DSIR_TOP_K,
    dsir_importance_weights,
)
from mvrs_dspa_spark.tables import table


def test_dsir_selects_target_enriched_topk(spark, sf_small):
    out = dsir_importance_weights(spark, sf_small).collect()
    assert len(out) == DSIR_TOP_K
    assert [r.sel_rank for r in out] == list(range(1, DSIR_TOP_K + 1))
    weights = [r.weight for r in out]
    assert weights == sorted(weights, reverse=True)

    d = table(spark, sf_small, "documents")
    base_rate = (
        d.where(F.col("source") == DSIR_TARGET_SOURCE).count() / d.count()
    )
    sel_rate = sum(1 for r in out if r.is_target) / len(out)
    # the whole point of importance weighting: target docs score high
    # under their own distribution, so the selected set is enriched
    assert sel_rate > base_rate
