"""Known-pairs bucket cap: the (hour, props.k) self-join is quadratic
per bucket, so the distinct user list entering it is capped; the cap
must bound output without changing results at test scale."""

from __future__ import annotations

from mvrs_dspa_spark.operators import similarity


def test_known_pairs_bucket_cap_bounds_pairs(spark, sf_small, monkeypatch):
    baseline = similarity._known_pairs_df(spark, sf_small).count()

    monkeypatch.setattr(similarity, "KNOWN_BUCKET_CAP", 2)
    capped = similarity._known_pairs_df(spark, sf_small).count()
    assert capped <= baseline

    # cap=1 leaves one user per bucket -> no co-presence pairs at all
    monkeypatch.setattr(similarity, "KNOWN_BUCKET_CAP", 1)
    assert similarity._known_pairs_df(spark, sf_small).count() == 0


def test_known_pairs_cap_is_noop_at_test_scale(spark, sf_small, monkeypatch):
    # default cap far above real bucket sizes: result identical to uncapped
    default = similarity._known_pairs_df(spark, sf_small)
    monkeypatch.setattr(similarity, "KNOWN_BUCKET_CAP", 10**9)
    uncapped = similarity._known_pairs_df(spark, sf_small)
    assert default.exceptAll(uncapped).count() == 0
    assert uncapped.exceptAll(default).count() == 0
