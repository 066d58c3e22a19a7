"""ANSI-mode divide-by-zero edge cases (r3 ADVICE).

Spark 4.x runs ANSI mode by default, so any unguarded division whose
denominator CAN be zero on real data is a latent crash. These tests
construct exactly those degenerate inputs:

- `value_drift_ks`: an event type whose values fall entirely in one
  half of the time range (a newly-appearing type — the core drift
  scenario) -> n0 or n1 = 0 for that type. The query must return NULL
  ks columns for it, matching the DuckDB oracle, not throw.
- `mad_value_outliers`: an event type with constant values -> MAD = 0.
  The guard must not depend on conjunct evaluation order.
"""

from __future__ import annotations

import datetime

import pytest

from mvrs_dspa_spark.plans.analytics import mad_value_outliers, value_drift_ks
from tests.oracle_harness import compare


def _write_events(spark, tmp_path, rows):
    # single-file parquet (pyarrow) so the DuckDB side of the harness
    # can read the same path the Spark side does
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*rows))
    tbl = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], pa.timestamp("us")),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _ts(hour: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, hour, 0, 0)


@pytest.fixture()
def one_sided_events(spark, tmp_path):
    """'click' spans both halves; 'purchase' exists ONLY in the second
    half of the time range (n0 = 0 for it)."""
    rows = [(i, _ts(h), 1, "click", float(10 + i), "{}")
            for i, h in enumerate([0, 2, 4, 20, 22, 23])]
    rows += [(100 + i, _ts(h), 2, "purchase", float(50 + i), "{}")
             for i, h in enumerate([18, 21, 23])]
    return _write_events(spark, tmp_path, rows)


def test_value_drift_ks_one_sided_type_yields_null(spark, one_sided_events):
    out = {r.event_type: r for r in
           value_drift_ks(spark, one_sided_events).collect()}
    assert out["purchase"].n_ref == 0
    assert out["purchase"].ks_stat is None
    assert out["purchase"].ks_scaled is None
    assert out["click"].ks_stat is not None


def test_value_drift_ks_one_sided_oracle_parity(spark, one_sided_events):
    compare(spark, one_sided_events, "value_drift_ks")


@pytest.fixture()
def constant_value_events(spark, tmp_path):
    """'ping' has constant values (MAD = 0); 'click' has one extreme
    outlier against a tight cluster."""
    rows = [(i, _ts(i % 24), 1, "ping", 7.0, "{}") for i in range(20)]
    rows += [(200 + i, _ts(i % 24), 2, "click", v, "{}")
             for i, v in enumerate([10.0, 10.1, 9.9, 10.0, 10.05,
                                    9.95, 10.0, 500.0])]
    return _write_events(spark, tmp_path, rows)


def test_mad_outliers_constant_type_does_not_throw(
    spark, constant_value_events
):
    rows = mad_value_outliers(spark, constant_value_events).collect()
    # constant 'ping' contributes nothing; the click outlier is flagged
    assert all(r.event_type == "click" for r in rows)
    assert any(r.value == 500.0 for r in rows)


def test_mad_outliers_constant_type_oracle_parity(
    spark, constant_value_events
):
    compare(spark, constant_value_events, "mad_value_outliers")


# --- quarantine split on dirty data ----------------------------------------


@pytest.fixture()
def dirty_events(spark, tmp_path):
    rows = [
        (1, _ts(1), 1, "click", 10.0, "{}"),          # clean
        (2, _ts(2), 2, "view", -5.0, "{}"),           # value_out_of_range
        (3, datetime.datetime(2031, 1, 1), 3, "click", 1.0, "{}"),  # ts
        (4, _ts(4), 4, "hover", 1.0, "{}"),           # unknown_event_type
        (5, _ts(5), -9, "click", 1.0, "{}"),          # negative_user_id
        (6, _ts(6), -1, "tap", 999999.0, "{}"),       # three reasons
        (7, None, 7, "view", 2.0, "{}"),              # null ts
    ]
    return _write_events(spark, tmp_path, rows)


def test_quarantine_split_partitions_and_reasons(spark, dirty_events):
    from mvrs_dspa_spark.operators.validation import quarantine_split
    from mvrs_dspa_spark.tables import table

    ev = table(spark, dirty_events, "events")
    good, bad = quarantine_split(ev)
    good_ids = {r.event_id for r in good.collect()}
    bad_rows = {r.event_id: r.reasons for r in bad.collect()}
    assert good_ids == {1}
    assert set(bad_rows) == {2, 3, 4, 5, 6, 7}
    assert good_ids.isdisjoint(bad_rows)
    assert good.count() + bad.count() == ev.count()
    assert bad_rows[2] == "value_out_of_range"
    assert bad_rows[4] == "unknown_event_type"
    # fixed rule order in the reasons string
    assert bad_rows[6] == (
        "value_out_of_range,unknown_event_type,negative_user_id"
    )
    assert bad_rows[7] == "ts_out_of_range"


def test_quarantine_oracle_parity_on_dirty_data(spark, dirty_events):
    compare(spark, dirty_events, "events_quarantine")


@pytest.fixture()
def degenerate_value_events(spark, tmp_path):
    """r10 t-digest edges: one type with a SINGLE distinct value (its
    one grid cell straddles every k1 boundary; every centroid mean is
    identical and the interpolation denominators come from weights,
    not value gaps) and one type with exactly two values (the
    interpolation bracket has a single interior pair)."""
    rows = []
    for i in range(40):
        rows.append((i, _ts(1), 7, "constant", 42.0, "{}"))
    for i in range(40, 60):
        rows.append((i, _ts(2), 8, "twoval", 10.0 if i % 2 else 20.0, "{}"))
    return _write_events(spark, tmp_path, rows)


def test_tdigest_degenerate_values_do_not_throw(
    spark, degenerate_value_events
):
    from mvrs_dspa_spark.operators.sketches import tdigest_value_quantiles

    rows = tdigest_value_quantiles(spark, degenerate_value_events).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    # constant type: every probe quantile is exactly the one value
    assert all(r.est_value == 42.0 for r in by_type["constant"])
    # two-value type: estimates stay inside the value range, monotone
    ests = [r.est_value for r in sorted(by_type["twoval"], key=lambda r: r.q)]
    assert ests == sorted(ests)
    assert all(10.0 <= e <= 20.0 for e in ests)


def test_tdigest_degenerate_oracle_parity(spark, degenerate_value_events):
    compare(spark, degenerate_value_events, "tdigest_value_quantiles")


def test_agreement_single_cluster_oracle_parity(spark, tmp_path):
    """All-identical embeddings collapse every vector into ONE pinned
    cluster -> h_c = 0 -> NMI must be NULL (nullif guard) on BOTH
    engines, not a divide-by-zero."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    vec = [0.25] * 64
    tbl = pa.table(
        {
            "vec_id": pa.array(range(16), pa.int64()),
            "embedding": pa.array([vec] * 16, pa.list_(pa.float32())),
            "label": pa.array([i % 4 for i in range(16)], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    compare(spark, str(tmp_path), "kmeans_label_agreement")

    from mvrs_dspa_spark.operators.clustering import kmeans_label_agreement

    r = kmeans_label_agreement(spark, str(tmp_path)).collect()[0]
    assert r.nmi is None and r.purity is not None
