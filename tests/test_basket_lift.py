"""Market-basket lift pins (#130)."""

from __future__ import annotations

from mvrs_dspa_spark.plans.analytics2 import (
    BASKET_MIN_SUPPORT,
    basket_lift_pairs,
)


def test_basket_lift_bounds(spark, sf_small):
    out = basket_lift_pairs(spark, sf_small).collect()
    assert len(out) > 0
    for r in out:
        assert r.part_a < r.part_b
        assert r.n_pair >= BASKET_MIN_SUPPORT
        # a pair can't co-occur more often than either item occurs
        assert r.n_pair <= min(r.n_a, r.n_b)
        assert 0.0 < r.confidence_a_to_b <= 1.0
        assert r.lift > 0.0
