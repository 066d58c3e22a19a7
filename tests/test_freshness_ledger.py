"""The SURVEY §2g freshness ledger must match a mechanical
regeneration from the CORRECTNESS_r*.json files (VERDICT r7 'What's
wrong' #3: the hand-maintained table misled the next round's
rotation). `tools/freshness.py` is the only writer."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_freshness():
    spec = importlib.util.spec_from_file_location(
        "freshness", os.path.join(REPO, "tools", "freshness.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_ledger_matches_regeneration():
    mod = _load_freshness()
    with open(mod.SURVEY) as f:
        text = f.read()
    start = text.index("### 2g ")
    end = text.index("\n## ", start) + 1
    assert text[start:end] == mod.render(), (
        "SURVEY.md §2g is stale — run: python tools/freshness.py"
    )


def test_ledger_row_per_registered_query():
    from mvrs_dspa_spark.plans.registry import all_queries

    mod = _load_freshness()
    rendered = mod.render()
    for name in all_queries():
        assert f"| `{name}` |" in rendered
