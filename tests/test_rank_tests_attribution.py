"""Invariant pins for the rank-test / attribution wave (#178-180) —
independent ground truths the Spark==DuckDB parity hash can't express.
"""

from __future__ import annotations

import math

import pytest

from mvrs_dspa_spark.plans.registry import all_queries


def _run(spark, sf, name):
    return all_queries()[name].fn(spark, sf).collect()


def _midranks(values):
    """value -> midrank, computed the naive textbook way."""
    s = sorted(values)
    ranks = {}
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[s[i]] = (i + 1 + j) / 2  # average of ranks i+1..j
        i = j
    return ranks


@pytest.fixture(scope="module")
def events_values(spark, sf_small):
    from mvrs_dspa_spark.tables import table

    rows = (
        table(spark, sf_small, "events")
        .select("event_type", "value")
        .collect()
    )
    return [(r.event_type, round(r.value * 100)) for r in rows]


def test_mannwhitney_matches_naive_ranks(spark, sf_small, events_values):
    by_type = {}
    for t, v in events_values:
        by_type.setdefault(t, []).append(v)
    all_vals = [v for _, v in events_values]
    ranks = _midranks(all_vals)
    n = len(all_vals)
    got = {r.event_type: r for r in _run(spark, sf_small, "value_mannwhitney_by_type")}
    assert set(got) == set(by_type)
    for t, vals in by_type.items():
        n1 = len(vals)
        r1 = sum(ranks[v] for v in vals)
        u1 = r1 - n1 * (n1 + 1) / 2
        row = got[t]
        assert row.n_type == n1
        assert row.u_stat == round(u1, 2), (t, row.u_stat, u1)
        # z sign must agree with the mean-rank direction
        mean_rank_diff = r1 / n1 - (n * (n + 1) / 2 - r1) / (n - n1)
        if abs(mean_rank_diff) > 1e-9 and row.z_u is not None:
            assert (row.z_u > 0) == (mean_rank_diff > 0), (t, row)
        # rank-biserial in [-1, 1]
        assert -1 <= row.r_rank_biserial <= 1


def test_kruskal_wallis_matches_naive(spark, sf_small, events_values):
    by_type = {}
    for t, v in events_values:
        by_type.setdefault(t, []).append(v)
    all_vals = [v for _, v in events_values]
    ranks = _midranks(all_vals)
    n = len(all_vals)
    s = sum(
        sum(ranks[v] for v in vals) ** 2 / len(vals)
        for vals in by_type.values()
    )
    h = 12 / (n * (n + 1)) * s - 3 * (n + 1)
    # tie correction
    from collections import Counter

    cnt = Counter(all_vals)
    tie_t = sum(c**3 - c for c in cnt.values())
    c_corr = 1 - tie_t / (n**3 - n)
    (row,) = _run(spark, sf_small, "kruskal_wallis_value")
    assert row.n_events == n
    assert row.n_groups == len(by_type)
    # unit-granularity int-coding of the per-group terms loses < k on
    # S, i.e. < 12k/(n(n+1)) ~ 1e-5 on H at sf0.001
    assert row.h == pytest.approx(h, abs=1e-3)
    assert row.tie_correction == pytest.approx(c_corr, abs=1e-9)
    assert row.h_adj == pytest.approx(h / c_corr, abs=1e-3)


def _shapley_naive(user_events):
    """Exact Shapley from a {user: set(types)} dict, textbook form."""
    channels = sorted(
        {t for ts in user_events.values() for t in ts if t != "purchase"}
    )
    k = len(channels)
    masks = {}
    for ts in user_events.values():
        if "purchase" not in ts:
            continue
        m = frozenset(t for t in ts if t != "purchase")
        masks[m] = masks.get(m, 0) + 1

    def v(coal):
        return sum(c for m, c in masks.items() if m <= coal)

    phi = {}
    import itertools

    for ch in channels:
        others = [c for c in channels if c != ch]
        total = 0.0
        for r in range(len(others) + 1):
            for sub in itertools.combinations(others, r):
                s = frozenset(sub)
                w = (
                    math.factorial(len(s))
                    * math.factorial(k - len(s) - 1)
                    / math.factorial(k)
                )
                total += w * (v(s | {ch}) - v(s))
        phi[ch] = total
    return phi, v


def test_shapley_matches_naive_and_efficiency(spark, sf_small):
    from mvrs_dspa_spark.tables import table

    rows = (
        table(spark, sf_small, "events")
        .select("user_id", "event_type")
        .collect()
    )
    user_events = {}
    for r in rows:
        user_events.setdefault(r.user_id, set()).add(r.event_type)
    phi, v = _shapley_naive(user_events)

    got = {r.channel: r for r in _run(spark, sf_small, "shapley_channel_attribution")}
    assert set(got) == set(phi)
    for ch, want in phi.items():
        assert got[ch].shapley_conversions == pytest.approx(want, abs=1e-5), ch
        n_touched = sum(1 for ts in user_events.values() if ch in ts)
        assert got[ch].n_users_touched == n_touched
    # efficiency axiom: sum phi = v(full) - v(empty)
    full = frozenset(phi)
    assert sum(r.shapley_conversions for r in got.values()) == pytest.approx(
        v(full) - v(frozenset()), abs=1e-4
    )


def test_shapley_hand_case(spark, tmp_path):
    """3-user micro-case with hand-computed Shapley values:
    u1 {click, purchase}, u2 {view}, u3 {click, view, purchase}
    -> v(empty)=0, v(c)=1, v(v)=0, v(cv)=2
    -> phi_click = 1.5, phi_view = 0.5."""
    import datetime

    sdf = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 1, 1, 0, 0, i), u, t, 1.0, "{}")
            for i, (u, t) in enumerate(
                [
                    (1, "click"),
                    (1, "purchase"),
                    (2, "view"),
                    (3, "click"),
                    (3, "view"),
                    (3, "purchase"),
                ]
            )
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sdf.write.parquet(str(tmp_path / "events.parquet"))
    rows = {
        r.channel: r
        for r in all_queries()["shapley_channel_attribution"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert rows["click"].shapley_conversions == pytest.approx(1.5)
    assert rows["view"].shapley_conversions == pytest.approx(0.5)
    assert rows["click"].n_users_touched == 2
    assert rows["view"].n_users_touched == 2


def test_clustering_coefficient_consistency(spark, sf_small):
    """Sum of per-node triangle credits == 3 * triangle count (#20c),
    and every local_cc is a valid [0, 1] ratio."""
    tri_rows = _run(spark, sf_small, "item_cooccurrence_triangles")
    cc_rows = _run(spark, sf_small, "graph_clustering_coefficient")
    assert sum(r.triangles for r in cc_rows) == 3 * len(tri_rows)
    for r in cc_rows:
        assert 0.0 <= r.local_cc <= 1.0, r
        if r.degree >= 2:
            assert r.local_cc == round(
                2 * r.triangles / (r.degree * (r.degree - 1)), 6
            ), r
        else:
            assert r.triangles == 0 and r.local_cc == 0.0, r


def test_assortativity_bounds_and_counts(spark, sf_small):
    (row,) = _run(spark, sf_small, "graph_assortativity")
    deg_rows = _run(spark, sf_small, "graph_degree_stats")
    assert row.n_nodes == sum(r.n_items for r in deg_rows)
    # a Pearson correlation by construction
    if row.assortativity is not None:
        assert -1.0 <= row.assortativity <= 1.0 + 1e-9, row


def test_readability_formula_and_known_sentence(spark, tmp_path):
    sdf = spark.createDataFrame(
        [(1, "The cat sat on the mat.", "en", "s", 23),
         (2, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sdf.write.parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r.doc_id: r
        for r in all_queries()["doc_readability"].fn(spark, str(tmp_path)).collect()
    }
    r = rows[1]
    # 6 words, 1 sentence, syllables: the=1 cat=1 sat=1 on=1 the=1 mat.=1
    assert (r.n_words, r.n_sentences, r.n_syllables) == (6, 1, 6)
    assert r.flesch_ease == round(206.835 - 1.015 * 6 - 84.6 * 1.0, 4)
    assert r.fk_grade == round(0.39 * 6 + 11.8 * 1.0 - 15.59, 4)
    # empty doc: zero counts, NULL scores (no divide-by-zero under ANSI)
    e = rows[2]
    assert (e.n_words, e.n_syllables) == (0, 0)
    assert e.flesch_ease is None and e.fk_grade is None


def test_feature_hashing_conservation(spark, sf_small):
    """Sum of |weight| per doc <= token count (signs cancel, never
    create), every bucket within [0, D), and weights are stable under
    re-run (pure hash determinism)."""
    from mvrs_dspa_spark.operators.text_analysis import FEATURE_HASH_DIM

    tok_rows = {r.doc_id: r.n_ws_tokens
                for r in _run(spark, sf_small, "token_counts")}
    rows = _run(spark, sf_small, "feature_hashing_vectors")
    per_doc = {}
    for r in rows:
        assert 0 <= r.bucket < FEATURE_HASH_DIM
        assert r.weight != 0
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + abs(r.weight)
    for d, s in per_doc.items():
        assert s <= tok_rows[d], (d, s, tok_rows[d])
    assert rows == _run(spark, sf_small, "feature_hashing_vectors")


def test_kcore_truncated_peel_reaches_fixpoint(spark, sf_small):
    """At test SFs the 8-round truncated peel must equal the exact
    k-core (iterate-to-fixpoint Python peel over the same edge list),
    and the ladder must be monotone decreasing in k."""
    from mvrs_dspa_spark.operators.similarity import (
        KCORE_KS,
        cooccurrence_edges,
    )

    edges = [
        (r.i, r.j) for r in cooccurrence_edges(spark, sf_small).collect()
    ]
    rows = {r.k: r for r in _run(spark, sf_small, "graph_kcore_summary")}
    assert set(rows) == set(KCORE_KS)
    prev_nodes = prev_edges = None
    for k in KCORE_KS:
        e = set(edges)
        while True:
            from collections import Counter

            deg = Counter()
            for i, j in e:
                deg[i] += 1
                deg[j] += 1
            keep = {n for n, d in deg.items() if d >= k}
            e2 = {(i, j) for i, j in e if i in keep and j in keep}
            if e2 == e:
                break
            e = e2
        nodes = {n for ij in e for n in ij}
        assert rows[k].core_nodes == len(nodes), k
        assert rows[k].core_edges == len(e), k
        if prev_nodes is not None:
            assert rows[k].core_nodes <= prev_nodes
            assert rows[k].core_edges <= prev_edges
        prev_nodes, prev_edges = rows[k].core_nodes, rows[k].core_edges


def test_spearman_matches_naive(spark, sf_small):
    from mvrs_dspa_spark.tables import table

    rows = (
        table(spark, sf_small, "events")
        .selectExpr(
            "event_type",
            "cast(round(value * 100) as long) as v",
            "hour(ts) as h",
        )
        .collect()
    )
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append((r.v, r.h))
    got = {r.event_type: r for r in _run(spark, sf_small, "value_hour_spearman")}
    assert set(got) == set(by_type)
    for t, pairs in by_type.items():
        xs = _midranks([v for v, _ in pairs])
        ys = _midranks([h for _, h in pairs])
        rx = [xs[v] for v, _ in pairs]
        ry = [ys[h] for _, h in pairs]
        n = len(pairs)
        sx, sy = sum(rx), sum(ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        sxx = sum(a * a for a in rx)
        syy = sum(b * b for b in ry)
        den = ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
        want = (n * sxy - sx * sy) / den if den else None
        assert got[t].n == n
        if want is None:
            assert got[t].rho_spearman is None
        else:
            assert got[t].rho_spearman == pytest.approx(want, abs=2e-6), t


def test_mann_kendall_matches_naive(spark, sf_small):
    from mvrs_dspa_spark.plans.analytics3 import ts_bucketed_points
    from mvrs_dspa_spark.plans.analytics5 import MK_Z_CRIT

    pts = {}
    for r in ts_bucketed_points(spark, sf_small).collect():
        pts.setdefault(r.event_type, []).append((r.hr_rel, r.n))
    got = {r.event_type: r for r in _run(spark, sf_small, "hourly_mann_kendall_trend")}
    assert set(got) == set(pts)
    from collections import Counter

    for t, series in pts.items():
        series.sort()
        ns = [n for _, n in series]
        m = len(ns)
        s = sum(
            (1 if ns[j] > ns[i] else -1 if ns[j] < ns[i] else 0)
            for i in range(m)
            for j in range(i + 1, m)
        )
        tie_v = sum(
            c * (c - 1) * (2 * c + 5)
            for c in Counter(ns).values()
            if c > 1
        )
        var_s = (m * (m - 1) * (2 * m + 5) - tie_v) / 18
        row = got[t]
        assert row.n_points == m and row.s_stat == s, t
        assert row.var_s == round(var_s, 4), t
        z = (
            (s - 1) / var_s**0.5
            if s > 0
            else (s + 1) / var_s**0.5
            if s < 0
            else 0.0
        )
        assert row.z_mk == pytest.approx(z, abs=1e-6), t
        want_trend = (
            "increasing"
            if s > 0 and z > MK_Z_CRIT
            else "decreasing"
            if s < 0 and z < -MK_Z_CRIT
            else "no_trend"
        )
        assert row.trend == want_trend, t


def test_kcenter_matches_naive_greedy(spark, sf_small):
    from mvrs_dspa_spark.tables import table

    rows = (
        table(spark, sf_small, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}

    def dist(a, b):
        da = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return round(1 - da / (na * nb), 6)

    got = sorted(
        _run(spark, sf_small, "coreset_kcenter_selection"),
        key=lambda r: r.selection_rank,
    )
    seed = min(vecs)
    assert got[0].vec_id == seed and got[0].coverage_radius is None
    mind = {vid: dist(v, vecs[seed]) for vid, v in vecs.items()}
    prev_radius = None
    for row in got[1:]:
        pick = max(mind, key=lambda vid: (mind[vid], -vid))
        assert row.vec_id == pick, row
        assert row.coverage_radius == mind[pick], row
        # greedy max-min radius is non-increasing
        if prev_radius is not None:
            assert row.coverage_radius <= prev_radius + 1e-12
        prev_radius = row.coverage_radius
        for vid, v in vecs.items():
            mind[vid] = min(mind[vid], dist(v, vecs[pick]))


def test_bh_fdr_properties(spark, sf_small):
    rows = sorted(
        _run(spark, sf_small, "mannwhitney_fdr_bh"),
        key=lambda r: r.p_raw,
    )
    mw = {r.event_type: r for r in _run(spark, sf_small, "value_mannwhitney_by_type")}
    m = len(rows)
    for i, r in enumerate(rows, start=1):
        # p from the exact normal CDF: the A&S approximation must be
        # within its published 7.5e-8 bound (far below the 1e-6 round)
        z = mw[r.event_type].z_u
        exact = math.erfc(abs(z) / math.sqrt(2))  # = 2*(1 - Phi(|z|))
        assert abs(r.p_raw - exact) < 2e-6, (r.event_type, r.p_raw, exact)
        assert 0.0 <= r.p_bh <= 1.0
        assert r.p_bh >= r.p_raw - 1e-9  # step-up never shrinks below raw... 
    # adjusted p is monotone in raw-p rank and >= BH formula at rank m
    for a, b in zip(rows, rows[1:]):
        assert a.p_bh <= b.p_bh + 1e-9
    assert rows[-1].p_bh == rows[-1].p_raw  # last rank: p*m/m = p
    for r in rows:
        assert r.significant == (r.p_bh <= 0.05)


def test_segmented_trend_matches_naive_ols(spark, sf_small):
    from mvrs_dspa_spark.plans.analytics import cusum_hourly_cells

    cells = {}
    for r in cusum_hourly_cells(spark, sf_small).collect():
        cells.setdefault(r.event_type, []).append((r.hour, r.x_c))
    cps = {
        r.event_type: r
        for r in _run(spark, sf_small, "hourly_changepoint_cusum")
    }
    got = {r.event_type: r for r in _run(spark, sf_small, "changepoint_segmented_trend")}
    assert set(got) == set(cells)

    def ols(pairs):
        n = len(pairs)
        if n < 2:
            return None
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        den = n * sxx - sx * sx
        if den == 0:
            return None
        return (n * sxy - sx * sy) / den / 100.0

    for t, series in cells.items():
        series.sort()
        xs = [(i, y) for i, (_, y) in enumerate(series)]
        cp_hour = cps[t].changepoint_hour
        before = [(x, y) for (x, y), (h, _) in zip(xs, series) if h <= cp_hour]
        after = [(x, y) for (x, y), (h, _) in zip(xs, series) if h > cp_hour]
        row = got[t]
        assert row.n_before == len(before) and row.n_after == len(after), t
        sb, sa = ols(before), ols(after)
        assert row.slope_before == (round(sb, 6) if sb is not None else None), t
        assert row.slope_after == (round(sa, 6) if sa is not None else None), t
        if before and after:
            mb = sum(y for _, y in before) / len(before) / 100.0
            ma = sum(y for _, y in after) / len(after) / 100.0
            assert row.level_shift == pytest.approx(ma - mb, abs=2e-6), t
            # level_shift must agree in sign/magnitude with #10an's means
            cp = cps[t]
            assert row.level_shift == pytest.approx(
                cp.mean_after - cp.mean_before, abs=2e-6
            ), t


def test_anova_and_bf_match_naive(spark, sf_small, events_values):
    import statistics

    by_type = {}
    for t, v in events_values:
        by_type.setdefault(t, []).append(v)

    def f_oneway(groups):
        all_v = [v for g in groups for v in g]
        n, k = len(all_v), len(groups)
        gm = sum(all_v) / n
        ssb = sum(len(g) * (sum(g) / len(g) - gm) ** 2 for g in groups)
        ssw = sum(
            (v - sum(g) / len(g)) ** 2 for g in groups for v in g
        )
        sst = ssb + ssw
        return (ssb / (k - 1)) / (ssw / (n - k)), ssb / sst

    groups = list(by_type.values())
    f, eta = f_oneway(groups)
    (row,) = _run(spark, sf_small, "value_anova_by_type")
    assert row.n_total == sum(len(g) for g in groups)
    assert row.n_groups == len(groups)
    # unit-coded per-group terms lose O(k) on the cent^2-scale SS —
    # relative error ~1e-9 at sf0.001
    assert row.f_stat == pytest.approx(f, rel=1e-4, abs=1e-6)
    assert row.eta_sq == pytest.approx(eta, rel=1e-4, abs=1e-6)

    zgroups = []
    for g in groups:
        med = statistics.median(g)
        zgroups.append([abs(v - med) for v in g])
    fz, etaz = f_oneway(zgroups)
    (bf,) = _run(spark, sf_small, "value_brown_forsythe")
    assert bf.f_stat == pytest.approx(fz, rel=1e-4, abs=1e-6)
    assert bf.eta_sq == pytest.approx(etaz, rel=1e-4, abs=1e-6)


def test_bootstrap_ci_properties(spark, sf_small):
    """CI brackets the point estimate, widths are positive, and the
    replicate machinery matches a naive recompute of one replicate."""
    from mvrs_dspa_spark.functions import hashing as H
    from mvrs_dspa_spark.plans.analytics5 import (
        _BOOT_A,
        _BOOT_B_,
        _POIS_CUM,
        BOOT_B,
    )
    from mvrs_dspa_spark.tables import table

    rows = _run(spark, sf_small, "bootstrap_mean_ci")
    assert len(rows) > 0
    for r in rows:
        assert r.ci_lo <= r.mean_v <= r.ci_hi, r
        assert r.ci_lo < r.ci_hi, r
        # width sanity: a 95% CI of a mean over n~200 cent values in
        # [0, 500] must be far narrower than the full range
        assert r.ci_hi - r.ci_lo < 50, r

    # naive recompute of replicate b=0's weighted mean for one type
    ev = (
        table(spark, sf_small, "events")
        .selectExpr("event_type", "event_id", "cast(round(value*100) as long) as x")
        .collect()
    )
    t0 = ev[0].event_type
    a, b_ = _BOOT_A, _BOOT_B_
    P = H.P

    def w_of(eid, b):
        u = ((a * ((eid * BOOT_B + b) % P) + b_) % P) / P
        for k, c in enumerate(_POIS_CUM):
            if u < c:
                return k
        return 6

    sw = swx = 0
    for r in ev:
        if r.event_type != t0:
            continue
        w = w_of(r.event_id, 0)
        sw += w
        swx += w * r.x
    want = round(swx / (sw * 100), 6)
    # reproduce via the registered pipeline's replicate frame
    from mvrs_dspa_spark.plans.analytics5 import rank_cents_col
    import pyspark.sql.functions as F

    got = (
        table(spark, sf_small, "events")
        .where(F.col("event_type") == t0)
        .select(
            rank_cents_col().alias("x"),
            (
                (
                    F.lit(a)
                    * ((F.col("event_id") * BOOT_B + 0) % P)
                    + b_
                )
                % P
                / float(P)
            ).alias("u"),
        )
    )
    wcol = F.lit(6)
    for k in range(len(_POIS_CUM) - 1, -1, -1):
        wcol = F.when(F.col("u") < _POIS_CUM[k], F.lit(k)).otherwise(wcol)
    agg = got.select("x", wcol.alias("w")).agg(
        F.sum(F.col("w") * F.col("x")).alias("swx"), F.sum("w").alias("sw")
    ).collect()[0]
    assert agg.sw == sw and agg.swx == swx
    assert round(agg.swx / (agg.sw * 100), 6) == want


def test_pack_efficiency_consistent_with_pack(spark, sf_small):
    from mvrs_dspa_spark.operators.sampling import PACK_CAPACITY

    packed = {}
    for r in _run(spark, sf_small, "pack_sequences"):
        packed.setdefault(r.source, []).append(r.total_chars)
    got = {r.source: r for r in _run(spark, sf_small, "pack_efficiency_report")}
    assert set(got) == set(packed)
    for src, bins in packed.items():
        row = got[src]
        assert row.bins_used == len(bins)
        assert row.total_chars == sum(bins)
        assert row.bins_lower_bound == -(-sum(bins) // PACK_CAPACITY)
        # the start-position rule lets bins overflow, so bins_used can
        # sit BELOW the no-overflow lower bound — but never by more
        # than the number of overflowing bins
        assert row.bins_used >= row.bins_lower_bound - row.overflow_bins
        assert row.max_bin_chars == max(bins)
        assert row.overflow_bins == sum(1 for b in bins if b > PACK_CAPACITY)
        assert 0 < row.fill_rate <= row.max_bin_chars / PACK_CAPACITY + 1


def test_epoch_shuffle_decorrelated_and_complete(spark, sf_small):
    from mvrs_dspa_spark.operators.sampling import EPOCHS, N_EPOCH_SHARDS

    rows = _run(spark, sf_small, "epoch_shuffle_order")
    by_epoch = {}
    for r in rows:
        assert 0 <= r.shard < N_EPOCH_SHARDS
        by_epoch.setdefault(r.epoch, {})[r.doc_id] = (r.shard, r.pos)
    assert set(by_epoch) == set(range(EPOCHS))
    docs = set(by_epoch[0])
    for e in range(EPOCHS):
        # every epoch is a complete permutation of the corpus
        assert set(by_epoch[e]) == docs
        # positions within a shard are a dense prefix of naturals
        from collections import defaultdict

        per_shard = defaultdict(list)
        for d, (s, p) in by_epoch[e].items():
            per_shard[s].append(p)
        for ps in per_shard.values():
            assert sorted(ps) == list(range(len(ps)))
    # cross-epoch decorrelation: Spearman rank correlation of global
    # order keys (shard*BIG + pos) must be near zero
    order0 = {d: s * 10**6 + p for d, (s, p) in by_epoch[0].items()}
    order1 = {d: s * 10**6 + p for d, (s, p) in by_epoch[1].items()}
    r0 = _midranks(list(order0.values()))
    r1 = _midranks(list(order1.values()))
    xs = [r0[order0[d]] for d in docs]
    ys = [r1[order1[d]] for d in docs]
    n = len(docs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    den = (
        sum((a - mx) ** 2 for a in xs) * sum((b - my) ** 2 for b in ys)
    ) ** 0.5
    rho = num / den
    assert abs(rho) < 0.15, rho


def test_did_matches_naive(spark, sf_small):
    from mvrs_dspa_spark.plans.analytics4 import _AB_A
    from mvrs_dspa_spark.tables import table
    import pyspark.sql.functions as F

    rows = (
        table(spark, sf_small, "events")
        .select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            F.round(F.col("value") * 100).cast("long").alias("x"),
        )
        .collect()
    )
    mn = min(r.us for r in rows)
    mx = max(r.us for r in rows)
    split = mn + (mx - mn) // 2
    cells = {}
    for r in rows:
        treated = ((_AB_A * (r.user_id % 2147483647)) % 2147483647) % 2 == 1
        post = r.us >= split
        cells.setdefault((treated, post), []).append(r.x)

    def mean_var(xs):
        n = len(xs)
        m = sum(xs) / n / 100
        v = (n * sum(x * x for x in xs) - sum(xs) ** 2) / (n * n * (n - 1)) / 1e4
        return n, m, v

    stats = {k: mean_var(v) for k, v in cells.items()}
    did = (stats[(True, True)][1] - stats[(True, False)][1]) - (
        stats[(False, True)][1] - stats[(False, False)][1]
    )
    se = sum(v / n for n, _, v in stats.values()) ** 0.5
    (row,) = _run(spark, sf_small, "did_analysis")
    assert row.n_t_pre == stats[(True, False)][0]
    assert row.n_c_post == stats[(False, True)][0]
    assert row.did_estimate == pytest.approx(did, abs=2e-6)
    assert row.se == pytest.approx(se, abs=2e-6)
    assert row.t_stat == pytest.approx(did / se, abs=2e-5)


def test_capture_recapture_identities(spark, sf_small):
    (r,) = _run(spark, sf_small, "user_capture_recapture")
    # inclusion-exclusion: observed = n1 + n2 - overlap
    assert r.n_observed == r.n_first_half + r.n_second_half - r.n_both
    # Chapman is >= the observed count minus rounding, and coverage <= ~1
    assert r.chapman_estimate >= r.n_observed - 1
    assert 0 < r.coverage <= 1.0 + 1e-6


def test_intrinsic_dim_recovers_low_dim_manifold(spark, tmp_path):
    """Vectors on a 2-dim linear subspace of R^64 must estimate
    id ~ 2, far from the ambient 64."""
    import pyspark.sql.functions as F

    n, d, k = 400, 64, 2
    # deterministic pseudo-random latent coords and mixing matrix
    lat = [
        (F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(10_000)) / 10_000.0)
        for j in range(k)
    ]
    mix = [[((7 * i + 3 * j + 1) % 13) / 13.0 for j in range(k)] for i in range(d)]
    dims = F.array(
        *[
            sum(F.lit(mix[i][j]) * lat[j] for j in range(k)).cast("float")
            for i in range(d)
        ]
    )
    (
        spark.range(0, n, 1, 8)
        .select(
            F.col("id").alias("vec_id"),
            dims.alias("embedding"),
            F.lit(0).alias("label"),
        )
        .write.parquet(str(tmp_path / "embeddings.parquet"))
    )
    (r,) = (
        all_queries()["embedding_intrinsic_dim"]
        .fn(spark, str(tmp_path))
        .collect()
    )
    assert r.n_probes > 0
    assert r.id_twonn is not None
    assert 1.0 < r.id_twonn < 5.0, r  # ~2 expected, wide noise band


def test_cochran_armitage_matches_naive(spark, sf_small):
    from mvrs_dspa_spark.tables import table
    import pyspark.sql.functions as F

    rows = (
        table(spark, sf_small, "events")
        .select(
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            (F.col("event_type") == "purchase").cast("int").alias("s"),
        )
        .collect()
    )
    daily = {}
    for r in rows:
        n, s = daily.get(r.day, (0, 0))
        daily[r.day] = (n + 1, s + r.s)
    mn = min(daily)
    ws = [(d - mn, n, s) for d, (n, s) in daily.items()]
    N = sum(n for _, n, _ in ws)
    S = sum(s for _, _, s in ws)
    p = S / N
    num = sum(w * s for w, _, s in ws) - p * sum(w * n for w, n, _ in ws)
    den = (
        p
        * (1 - p)
        * (
            sum(w * w * n for w, n, _ in ws)
            - sum(w * n for w, n, _ in ws) ** 2 / N
        )
    ) ** 0.5
    z = num / den
    (row,) = _run(spark, sf_small, "conversion_trend_cochran_armitage")
    assert row.n_days == len(daily)
    assert row.n_trials == N and row.n_success == S
    assert row.z_ca == pytest.approx(z, abs=2e-6)
    want = "increasing" if z > 1.96 else "decreasing" if z < -1.96 else "no_trend"
    assert row.trend == want


def test_ql_dirichlet_matches_naive(spark, sf_small):
    import math

    from mvrs_dspa_spark.operators.retrieval import (
        GATE_QUERY_TERMS,
        QL_MU,
        TOP_N,
    )
    from mvrs_dspa_spark.tables import table

    docs = [
        (r.doc_id, r.text.lower().split())
        for r in table(spark, sf_small, "documents").collect()
    ]
    total = sum(len(t) for _, t in docs)
    ctf = {
        q: sum(t.count(q) for _, t in docs) for q in GATE_QUERY_TERMS
    }
    scored = []
    for doc_id, toks in docs:
        m_c, matched = 0, 0
        for q in GATE_QUERY_TERMS:
            tf = toks.count(q)
            if tf > 0 and ctf[q] > 0:
                matched += 1
                m_c += round(1e9 * math.log(1 + tf * total / (QL_MU * ctf[q])))
        if matched == 0:
            continue
        sc = m_c + len(GATE_QUERY_TERMS) * round(
            1e9 * math.log(QL_MU / (len(toks) + QL_MU))
        )
        scored.append((-sc, doc_id, matched))
    scored.sort()
    want = [
        (doc_id, matched, round(-sc / 1e9, 6))
        for sc, doc_id, matched in scored[:TOP_N]
    ]
    got = [
        (r.doc_id, r.n_terms_matched, r.ql_score)
        for r in _run(spark, sf_small, "ql_dirichlet_search")
    ]
    assert got == want


def test_drift_divergences_match_naive(spark, sf_small):
    import math

    from mvrs_dspa_spark.tables import table
    import pyspark.sql.functions as F

    rows = (
        table(spark, sf_small, "events")
        .select(
            "event_type",
            F.unix_micros("ts").alias("us"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .collect()
    )
    mn = min(r.us for r in rows)
    mx = max(r.us for r in rows)
    split = mn + (mx - mn) // 2
    grids = {}
    for r in rows:
        g = grids.setdefault(r.event_type, {})
        a, b = g.get(r.c, (0, 0))
        g[r.c] = (a + 1, b) if r.us < split else (a, b + 1)
    got = {r.event_type: r for r in _run(spark, sf_small, "value_drift_divergences")}
    for t, g in grids.items():
        t1 = sum(a for a, _ in g.values())
        t2 = sum(b for _, b in g.values())
        if t1 == 0 or t2 == 0:
            assert t not in got
            continue
        j_c = h_c = 0
        for a, b in g.values():
            p, q = a / t1, b / t2
            m = (p + q) / 2
            term = 0.0
            if a > 0:
                term += p * math.log(p / m)
            if b > 0:
                term += q * math.log(q / m)
            j_c += round(1e9 * term / 2)
            h_c += round(1e12 * math.sqrt(p * q))
        row = got[t]
        assert row.n_first_half == t1 and row.n_second_half == t2
        assert row.jsd == round(j_c / 1e9, 6), t
        assert row.hellinger == round(
            math.sqrt(max(0.0, 1 - h_c / 1e12)), 6
        ), t
        # bounded divergences
        assert 0 <= row.jsd <= math.log(2) + 1e-9
        assert 0 <= row.hellinger <= 1 + 1e-9


def test_single_type_slice_degrades_to_nulls(spark, tmp_path):
    """A slice with ONE event type (a filtered export, the routine
    degenerate case at scale) must yield NULL for the undefined
    statistics — not an ANSI DIVIDE_BY_ZERO (the r6
    embedding_truncation_eval failure class, re-found in r8 for
    MW/ANOVA/BF and fixed with engine-mirrored guards)."""
    import datetime

    sdf = spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1, 0, 0, i % 60), i % 7,
             "click", 1.0 + i % 5, "{}")
            for i in range(40)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sdf.write.parquet(str(tmp_path / "events.parquet"))
    sf = str(tmp_path)

    (mw,) = all_queries()["value_mannwhitney_by_type"].fn(spark, sf).collect()
    assert mw.n_type == 40
    assert mw.z_u is None and mw.r_rank_biserial is None

    (an,) = all_queries()["value_anova_by_type"].fn(spark, sf).collect()
    assert an.n_groups == 1 and an.f_stat is None

    (bf,) = all_queries()["value_brown_forsythe"].fn(spark, sf).collect()
    assert bf.n_groups == 1 and bf.f_stat is None

    (kw,) = all_queries()["kruskal_wallis_value"].fn(spark, sf).collect()
    assert kw.n_groups == 1 and kw.h == 0.0

    # the rest of the family already degrades cleanly
    for name in (
        "mannwhitney_fdr_bh",
        "shapley_channel_attribution",
        "did_analysis",
        "conversion_trend_cochran_armitage",
        "user_capture_recapture",
        "bootstrap_mean_ci",
        "value_drift_divergences",
    ):
        all_queries()[name].fn(spark, sf).collect()
