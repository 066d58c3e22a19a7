"""Sketch-based approximations must track their exact twins: the
approximate path is only a valid scale substitute if its error is
bounded on real data."""

from __future__ import annotations

from pyspark.sql import functions as F

from mvrs_dspa_spark.plans.analytics import (
    event_value_percentiles,
    event_value_percentiles_approx,
)
from mvrs_dspa_spark.plans.tpch import event_user_counts, event_user_counts_approx


def test_approx_percentiles_track_exact(spark, sf_medium):
    exact = {r.event_type: r for r in event_value_percentiles(spark, sf_medium).collect()}
    approx = {
        r.event_type: r for r in event_value_percentiles_approx(spark, sf_medium).collect()
    }
    assert set(exact) == set(approx)
    for et, e in exact.items():
        a = approx[et]
        for col in ("p50", "p90", "p99"):
            ev, av = getattr(e, col), getattr(a, col)
            # accuracy=10k -> rank error ~1e-4; values are cents-granular
            # so allow a small absolute + relative band
            assert abs(av - ev) <= max(0.05 * abs(ev), 2.0), (et, col, ev, av)


def test_hll_distinct_tracks_exact(spark, sf_medium):
    exact = {r.event_type: r.n_users for r in event_user_counts(spark, sf_medium).collect()}
    approx = {
        r.event_type: r.n_users_approx
        for r in event_user_counts_approx(spark, sf_medium).collect()
    }
    assert set(exact) == set(approx)
    for et, n in exact.items():
        # default rsd 5%: allow 3 sigma
        assert abs(approx[et] - n) <= max(3, 0.15 * n), (et, n, approx[et])


def test_portable_hll_accuracy_and_register_bound(spark, sf_medium):
    from mvrs_dspa_spark.functions import hashing as H
    from mvrs_dspa_spark.operators.sketches import (
        HLL_M,
        hll_registers,
        hll_user_counts,
    )
    from mvrs_dspa_spark.tables import table

    rows = hll_user_counts(spark, sf_medium).collect()
    assert len(rows) == 5
    for r in rows:
        # 512 registers -> ~4.6% standard error; allow 3 sigma
        assert abs(r.hll_estimate - r.n_exact) <= max(5, 0.15 * r.n_exact), r

    # register table is structurally bounded: <= m rows per group
    ev = table(spark, sf_medium, "events")
    regs = hll_registers(
        ev, H.str_code_col(F.col("user_id").cast("string")), "event_type"
    )
    per_group = regs.groupBy("event_type").count().collect()
    assert all(r["count"] <= HLL_M for r in per_group)


def test_portable_hll_registers_merge_by_max(spark, sf_small):
    """HLL mergeability (what makes it shuffle/stream-safe): registers
    of two disjoint halves combined with MAX must equal the registers
    of the union."""
    from mvrs_dspa_spark.functions import hashing as H
    from mvrs_dspa_spark.operators.sketches import hll_registers
    from mvrs_dspa_spark.tables import table

    ev = table(spark, sf_small, "events").select("user_id")
    code = H.str_code_col(F.col("user_id").cast("string"))
    full = {
        (r.bucket): r.m_j for r in hll_registers(ev, code).collect()
    }
    h1 = hll_registers(ev.where(F.col("user_id") % 2 == 0), code).collect()
    h2 = hll_registers(ev.where(F.col("user_id") % 2 == 1), code).collect()
    merged: dict = {}
    for r in [*h1, *h2]:
        merged[r.bucket] = max(merged.get(r.bucket, 0), r.m_j)
    assert merged == full


def test_join_size_estimate_tracks_exact(spark, sf_medium):
    from mvrs_dspa_spark.operators.sketches import join_size_estimate

    rows = join_size_estimate(spark, sf_medium).collect()
    assert len(rows) == 3
    for r in rows:
        # unbiased count-sketch, D=5/W=1024: generous 25% band
        assert abs(r.rel_error) <= 0.25, r
        assert r.sketch_estimate >= 0


# --- theta / KMV sketch ----------------------------------------------------


def test_theta_sketch_union_row_and_accuracy(spark, sf_medium):
    from mvrs_dspa_spark.operators.sketches import (
        THETA_K,
        theta_sketch_distinct_union,
    )

    rows = {r.event_type: r for r in theta_sketch_distinct_union(
        spark, sf_medium
    ).collect()}
    assert "__union__" in rows
    union = rows.pop("__union__")
    # the union estimate covers distinct users overall: bounded by the
    # per-type maxima and the sum
    assert union.n_exact >= max(r.n_exact for r in rows.values())
    assert union.n_exact <= sum(r.n_exact for r in rows.values())
    for r in [union, *rows.values()]:
        if r.n_exact < THETA_K:
            assert r.est_distinct == float(r.n_exact)
        else:
            # KMV with k=128: sd ~ n/sqrt(k-2) ~ 9%; allow 4 sd
            assert abs(r.rel_err) < 0.36, r


# --- t-digest --------------------------------------------------------------


def test_tdigest_compress_properties():
    import random

    from mvrs_dspa_spark.operators.sketches import (
        TD_DELTA,
        _td_compress,
        _td_quantile,
    )

    rng = random.Random(7)
    vals = sorted(rng.uniform(0, 100) for _ in range(20_000))
    cl = _td_compress(vals, [1.0] * len(vals), TD_DELTA)
    # bounded size, weight conservation, sorted means
    assert len(cl) <= 2 * TD_DELTA
    assert abs(sum(w for _, w in cl) - len(vals)) < 1e-6
    means = [m for m, _ in cl]
    assert means == sorted(means)
    # quantile accuracy: within ~1% rank error of the exact quantile
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = _td_quantile(cl, q)
        exact = vals[min(int(q * len(vals)), len(vals) - 1)]
        assert abs(est - exact) < 2.0, (q, est, exact)


def test_tdigest_merge_invariance():
    """Digest-of-digests (the distributed two-level path) must land
    near the single-digest result — the mergeability contract."""
    import random

    from mvrs_dspa_spark.operators.sketches import (
        TD_DELTA,
        _td_compress,
        _td_quantile,
    )

    rng = random.Random(11)
    vals = sorted(rng.gauss(50, 15) for _ in range(30_000))
    single = _td_compress(vals, [1.0] * len(vals), TD_DELTA)
    parts = []
    for i in range(16):
        chunk = sorted(vals[i::16])
        parts.extend(_td_compress(chunk, [1.0] * len(chunk), TD_DELTA))
    parts.sort()
    merged = _td_compress(
        [m for m, _ in parts], [w for _, w in parts], TD_DELTA
    )
    assert len(merged) <= 2 * TD_DELTA
    for q in (0.1, 0.5, 0.9):
        assert abs(_td_quantile(merged, q) - _td_quantile(single, q)) < 1.0


def test_tdigest_query_monotone_and_sane(spark, sf_medium):
    import duckdb

    from mvrs_dspa_spark.operators.sketches import tdigest_value_quantiles

    rows = tdigest_value_quantiles(spark, sf_medium).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    con = duckdb.connect()
    for t, rs in by_type.items():
        ests = [r.est_value for r in sorted(rs, key=lambda r: r.q)]
        assert ests == sorted(ests), t  # monotone in q
        exact = con.execute(
            f"SELECT quantile_cont(value, [0.01,0.1,0.25,0.5,0.75,0.9,0.99]) "
            f"FROM '{sf_medium}/events.parquet' WHERE event_type = ?",
            [t],
        ).fetchone()[0]
        for e, x in zip(ests, exact):
            # rank-accuracy at delta=100 over a smooth distribution:
            # generous 5%-of-range absolute band
            assert abs(e - x) <= 12.0, (t, e, x)
    con.close()


def test_theta_overlap_partial_synthetic(spark, tmp_path):
    """Controlled partial overlap: type A = users 0..999, type B =
    users 500..1499 -> true intersection 500, union 1500. The
    inclusion-exclusion estimate from K=128 KMV sketches must land
    within 30% (per-sketch std err ~1/sqrt(K-2) ~ 9%, three estimates
    compound); the sf tables' fully-overlapping types can't exercise
    this case."""
    import datetime as dt

    from mvrs_dspa_spark.operators.sketches import theta_sketch_overlap

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=i), uid, t, 1.0, "{}")
        for i, (uid, t) in enumerate(
            [(u, "click") for u in range(1000)]
            + [(u, "view") for u in range(500, 1500)]
        )
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(2).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    out = theta_sketch_overlap(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.type_a, r.type_b) == ("click", "view")
    assert r.inter_exact == 500
    assert abs(r.est_inter - 500) / 500 < 0.30
    assert abs(r.est_union - 1500) / 1500 < 0.15


def test_bloom_no_false_negatives(spark, sf_small, sf_medium):
    """The Bloom guarantee: every known member must be claimed present
    (n_true_members == n_known); the measured false-positive rate on
    true non-members should sit near the (bits_set/m)^k theory."""
    from mvrs_dspa_spark.operators.sketches import bloom_membership_report

    for sf in (sf_small, sf_medium):
        r = bloom_membership_report(spark, sf).collect()[0]
        assert r.n_true_members == r.n_known, "false negative!"
        assert r.n_claimed >= r.n_known
        assert 0.0 <= r.fp_rate <= 1.0
        # theory is the expected rate; allow generous sampling slack
        assert r.fp_rate <= max(5 * r.fp_theoretical, 0.05)


def test_tdigest_two_level_agrees_with_declarative(spark, sf_medium):
    """The greedy two-level digest-of-digests path (the streaming /
    partitioned deployment shape) must land near the registered
    declarative rank-bucket digest on every probe quantile — the two
    constructions approximate the same distribution."""
    from mvrs_dspa_spark.operators.sketches import (
        tdigest_merge_partials,
        tdigest_value_quantiles,
    )

    decl = {
        (r.event_type, r.q): r.est_value
        for r in tdigest_value_quantiles(spark, sf_medium).collect()
    }
    greedy = {
        (r.event_type, r.q): r.est_value
        for r in tdigest_merge_partials(spark, sf_medium).collect()
    }
    assert set(decl) == set(greedy)
    for key, d in decl.items():
        assert abs(d - greedy[key]) <= 12.0, (key, d, greedy[key])
