"""Property tests: salted aggregation and table_diff must be exactly
equivalent to their naive definitions on arbitrary inputs (hypothesis
generates the frames; Spark executes; a pure-python mirror checks)."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

keys = st.integers(min_value=0, max_value=5)
vals = st.integers(min_value=-100, max_value=100)
rows = st.lists(st.tuples(keys, vals), min_size=0, max_size=40)


@settings(max_examples=12, deadline=None)
@given(rows)
def test_salted_aggregate_equals_plain_groupby(spark, data):
    from mvrs_dspa_spark.operators import skew

    if not data:
        return
    df = spark.createDataFrame(
        [(k, float(v), i) for i, (k, v) in enumerate(data)],
        "k long, v double, rid long",
    )
    got = {
        r.k: (r.n_rows, r.sum_v)
        for r in skew.salted_aggregate(df, ["k"], "rid", ["v"], n=4).collect()
    }
    want_n = Counter(k for k, _ in data)
    want_s: dict = {}
    for k, v in data:
        want_s[k] = want_s.get(k, 0.0) + float(v)
    assert {k: n for k, (n, _) in got.items()} == dict(want_n)
    for k, (_, s) in got.items():
        assert abs(s - want_s[k]) < 1e-9


pairs = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 3)),
    min_size=0,
    max_size=20,
    unique_by=lambda t: t[0],
)


@settings(max_examples=12, deadline=None)
@given(pairs, pairs)
def test_table_diff_statuses_match_naive(spark, old, new):
    from mvrs_dspa_spark.operators.validation import table_diff

    o = spark.createDataFrame(old or [], "k long, v long")
    n = spark.createDataFrame(new or [], "k long, v long")
    got = {r.k: r.status for r in table_diff(o, n, ["k"], ["v"]).collect()}
    od, nd = dict(old), dict(new)
    want = {}
    for k in set(od) | set(nd):
        if k not in od:
            want[k] = "added"
        elif k not in nd:
            want[k] = "removed"
        elif od[k] != nd[k]:
            want[k] = "changed"
        else:
            want[k] = "unchanged"
    assert got == want
