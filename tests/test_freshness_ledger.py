"""The SURVEY §2g freshness ledger must match a mechanical
regeneration from the CORRECTNESS_r*.json files (VERDICT r7 'What's
wrong' #3: the hand-maintained table misled the next round's
rotation). `tools/freshness.py` is the only writer.

VERDICT r8 'What's wrong' #1: the driver drops CORRECTNESS_r{N}.json
AFTER the builder's close commit, so the check regenerates from the
ledger's OWN `through CORRECTNESS_rNN` stamp — driver files newer than
the stamp are pending rounds, not staleness, and the suite stays green
at the judgment snapshot. The regeneration schedule is the first
commit of each round.
"""

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
    through = mod.stamped_round(text)
    assert text[start:end] == mod.render(through), (
        "SURVEY.md §2g is stale — run: python tools/freshness.py"
    )


def test_ledger_stamp_not_behind_round_start():
    """The stamp may trail the newest driver file ONLY by rounds that
    arrived after this tree's last regeneration (the post-close drop).
    A stamp more than one round behind means a round started without
    its first-commit regeneration — the exact protocol failure this
    guards."""
    mod = _load_freshness()
    with open(mod.SURVEY) as f:
        text = f.read()
    through = mod.stamped_round(text)
    assert mod.max_available_round() - through <= 1, (
        f"§2g stamp r{through} is >1 round behind the newest "
        f"CORRECTNESS file (r{mod.max_available_round()}) — the "
        "first-commit regeneration was skipped; run: "
        "python tools/freshness.py"
    )


def test_ledger_row_per_registered_query():
    from mvrs_dspa_spark.plans.registry import all_queries

    mod = _load_freshness()
    rendered = mod.render(mod.max_available_round())
    for name in all_queries():
        assert f"| `{name}` |" in rendered


def test_queue_is_oldest_first_and_covers_registry():
    from mvrs_dspa_spark.plans.registry import all_queries

    mod = _load_freshness()
    import contextlib
    import io

    buf = io.StringIO()
    n = len(all_queries())
    with contextlib.redirect_stdout(buf):
        mod.queue(n)
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == n
    # ranked by latest-check round, non-decreasing
    rounds = []
    for ln in lines:
        state = ln[ln.index("[") :]
        m = __import__("re").search(r"r(\d+)", state)
        rounds.append(int(m.group(1)) if m else -1)
    assert rounds == sorted(rounds)


def test_driver_priority_is_tool_generated():
    """VERDICT r9 #2: _DRIVER_PRIORITY is the tool-computed 50-name
    window (changed/new first, then the oldest-first queue) — exactly
    50 names, no duplicates, bit-identical to compute_window(). A
    hand edit, a stale regeneration, or an over-budget
    _CHANGED_THIS_ROUND fails here."""
    from mvrs_dspa_spark.plans.registry import (
        _CHANGED_THIS_ROUND,
        _DRIVER_PRIORITY,
    )

    mod = _load_freshness()
    assert len(_DRIVER_PRIORITY) == mod.WINDOW_SIZE
    assert len(set(_DRIVER_PRIORITY)) == len(_DRIVER_PRIORITY)
    assert list(_DRIVER_PRIORITY) == mod.compute_window(), (
        "run: python tools/freshness.py --write-window"
    )
    assert len(_CHANGED_THIS_ROUND) <= 5, (
        "drain policy: at most 5 changed-implementation slots per round"
    )
