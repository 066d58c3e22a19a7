"""cdc_merge_apply: all four MERGE actions (insert / update / delete /
unchanged) on a synthetic log where each path is exercised — the
registered sf data is dense enough that every user is 'updated', so
this pins the branches parity alone doesn't reach."""

from __future__ import annotations

import datetime

from mvrs_dspa_spark.plans.analytics import cdc_merge_apply
from tests.oracle_harness import compare
from tests.test_ansi_edge_cases import _write_events


def _ts(hour: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, hour, 0, 0)


def _cdc_events(spark, tmp_path):
    # time range 0h..20h -> split at 10h
    rows = [
        # user 1: base only -> unchanged
        (1, _ts(1), 1, "click", 10.0, "{}"),
        # user 2: base + delta upsert -> updated (to 99.0)
        (2, _ts(2), 2, "view", 20.0, "{}"),
        (3, _ts(12), 2, "purchase", 99.0, "{}"),
        # user 3: delta only -> inserted
        (4, _ts(13), 3, "signup", 7.0, "{}"),
        # user 4: base + delta ends in error -> deleted
        (5, _ts(3), 4, "click", 30.0, "{}"),
        (6, _ts(14), 4, "purchase", 31.0, "{}"),
        (7, _ts(15), 4, "error", 0.0, "{}"),
        # user 5: error mid-delta then a later upsert -> updated (41.0)
        (8, _ts(4), 5, "click", 40.0, "{}"),
        (9, _ts(14), 5, "error", 0.0, "{}"),
        (10, _ts(16), 5, "view", 41.0, "{}"),
        # range advancers so the split lands at 10h
        (11, _ts(0), 9, "view", 0.0, "{}"),
        (12, _ts(20), 9, "view", 1.0, "{}"),
    ]
    return _write_events(spark, tmp_path, rows)


def test_cdc_merge_all_actions(spark, tmp_path):
    sf = _cdc_events(spark, tmp_path)
    out = {r.user_id: r for r in cdc_merge_apply(spark, sf).collect()}
    assert out[1].merge_action == "unchanged"
    assert out[1].current_value == 10.0
    assert out[2].merge_action == "updated"
    assert out[2].current_value == 99.0
    assert out[3].merge_action == "inserted"
    assert out[3].current_value == 7.0
    assert 4 not in out, "tombstoned user must be deleted"
    assert out[5].merge_action == "updated"
    assert out[5].current_value == 41.0


def test_cdc_merge_all_actions_oracle_parity(spark, tmp_path):
    compare(spark, _cdc_events(spark, tmp_path), "cdc_merge_apply")
