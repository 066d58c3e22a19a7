"""Regenerate the SURVEY.md §2g verification-freshness ledger.

The ledger is one row per registered query: its gate kind (oracle vs
rows) and the LATEST round the external driver checked it, derived
mechanically from the CORRECTNESS_r*.json files plus the registry's
current 50-slot `_DRIVER_PRIORITY` window. VERDICT r7 'What's wrong'
#3: the hand-maintained table went stale the round after it was
written; this script is the single source of truth.

Staleness protocol (VERDICT r8 'What's wrong' #1): the driver drops
CORRECTNESS_r{N}.json AFTER the builder's close commit, so a ledger
regenerated at round close is stale one file-drop later, every round,
by construction. The ledger therefore carries an explicit
``through CORRECTNESS_r{N}`` stamp, and ``--check`` compares against a
regeneration FROM THAT STAMPED ROUND ONLY — correctness files newer
than the stamp are *pending*, not staleness. The regeneration schedule
is the FIRST commit of each round (when the previous round's
correctness file exists), not round close.

Usage:
    python tools/freshness.py            # rewrite SURVEY.md in place
    python tools/freshness.py --check    # exit 1 if SURVEY.md is stale
    python tools/freshness.py --queue N  # print the N oldest-first
                                         # re-sweep candidates for the
                                         # next round's window
    python tools/freshness.py --window   # print the 50-name driver
                                         # window (changed/new first,
                                         # then the oldest-first queue)
    python tools/freshness.py --write-window
                                         # regenerate _DRIVER_PRIORITY
                                         # in plans/registry.py between
                                         # the GENERATED WINDOW markers
                                         # (VERDICT r9 #2: the window
                                         # is produced by this tool,
                                         # not hand-accreted)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SURVEY = os.path.join(REPO, "SURVEY.md")

_HEADER = """### 2g Verification-freshness ledger (rotation bookkeeping)

One row per registered query: its gate kind and the LATEST round the
external driver checked it — regenerated mechanically from
CORRECTNESS_r*.json through CORRECTNESS_r{through} by
`tools/freshness.py` (run as the FIRST commit of each round;
`tests/test_freshness_ledger.py` fails if this table is stale relative
to its stamped round — driver files newer than the stamp are pending,
not staleness). `(r{next} window)` marks the 50 slots the current
`_DRIVER_PRIORITY` submits for checking; `never` = implemented and
locally parity-green but awaiting a first driver slot. Policy: changed
or never-checked queries outrank re-verification of stable hash-green
rows; the re-sweep queue cycles the remainder oldest-first.

| query | gate | latest driver check |
|---|---|---|
"""

_STAMP_RE = re.compile(r"through CORRECTNESS_r(\d+)")


def _latest_checks(through: int) -> dict[str, str]:
    """Map query -> 'rN hash-pass' / 'rN rows-ran' / 'rN HASH-FAIL' /
    'rN ERROR(...)' from the newest round <= ``through`` that checked
    it."""
    latest: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m or int(m.group(1)) > through:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, res in data.items():
            if res.get("hash_match"):
                state = f"r{rnd} hash-pass"
            elif res.get("err") == "no_oracle":
                state = f"r{rnd} rows-ran"
            elif res.get("err"):
                state = f"r{rnd} ERROR({res['err']})"
            elif res.get("rows_match"):
                state = f"r{rnd} HASH-FAIL"
            else:
                state = f"r{rnd} ROWS-FAIL"
            latest[name] = state
    return latest


def max_available_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0)


def render(through: int) -> str:
    sys.path.insert(0, REPO)
    from mvrs_dspa_spark.plans.registry import all_queries

    specs = all_queries()
    window = list(specs)[:50]
    latest = _latest_checks(through)
    next_round = through + 1
    lines = [
        _HEADER.replace("{through}", f"{through:02d}").replace(
            "{next}", str(next_round)
        )
    ]
    # Row order must be deterministic regardless of which modules a
    # host process imported first (_REGISTRY insertion order follows
    # import order for names outside _DRIVER_PRIORITY): the 50-slot
    # window in driver order, then the remainder sorted by name.
    tail = sorted(n for n in specs if n not in set(window))
    for name in [*window, *tail]:
        spec = specs[name]
        gate = "oracle" if spec.oracle is not None else "rows"
        state = latest.get(name, "never")
        if name in set(window):
            state += f" (r{next_round} window)"
        lines.append(f"| `{name}` | {gate} | {state} |\n")
    return "".join(lines) + "\n"


def stamped_round(text: str) -> int:
    """The ``through CORRECTNESS_r{N}`` stamp of the checked-in ledger."""
    start = text.index("### 2g ")
    end = text.index("\n## ", start) + 1
    m = _STAMP_RE.search(text[start:end])
    if m is None:
        raise ValueError(
            "SURVEY.md §2g carries no 'through CORRECTNESS_rNN' stamp — "
            "run: python tools/freshness.py"
        )
    return int(m.group(1))


def apply(check_only: bool) -> int:
    with open(SURVEY) as f:
        text = f.read()
    start = text.index("### 2g ")
    end = text.index("\n## ", start) + 1
    if check_only:
        try:
            through = stamped_round(text)
        except ValueError as exc:
            print(exc)
            return 1
        if text[start:end] == render(through):
            pending = max_available_round() - through
            note = f" ({pending} round(s) pending)" if pending > 0 else ""
            print(f"SURVEY.md §2g ledger is up to date through r{through}{note}")
            return 0
        print("SURVEY.md §2g ledger is STALE — run: python tools/freshness.py")
        return 1
    through = max_available_round()
    new_text = text[:start] + render(through) + text[end:]
    if new_text == text:
        print(f"SURVEY.md §2g ledger is up to date through r{through}")
        return 0
    with open(SURVEY, "w") as f:
        f.write(new_text)
    print(f"SURVEY.md §2g ledger regenerated through r{through}")
    return 0


def _queue_order(through: int) -> tuple[list[str], dict[str, str]]:
    """Every registered query ranked by (latest driver-check round,
    never-checked first), oracle gates before rows gates within a
    round (an oracle slot buys a value-hash re-verification; a rows
    slot only re-runs), name as the final tiebreak. ``through`` bounds
    which CORRECTNESS files participate — the pinned window ranks
    against the ledger's stamped round so a post-close artifact drop
    cannot reshuffle it (ADVICE r10 #1)."""
    sys.path.insert(0, REPO)
    from mvrs_dspa_spark.plans.registry import all_queries

    specs = all_queries()
    latest = _latest_checks(through)
    rnd = {
        name: int(m.group(1))
        for name, state in latest.items()
        if (m := re.match(r"r(\d+)", state))
    }

    def key(name: str):
        return (
            rnd.get(name, -1),  # never-checked first
            specs[name].oracle is None,  # oracle gates first
            name,
        )

    return sorted(specs, key=key), latest


def queue(n: int) -> None:
    """Print the n oldest-first re-sweep candidates (`_queue_order`) —
    the mechanical source of the window's drain block."""
    sys.path.insert(0, REPO)
    from mvrs_dspa_spark.plans.registry import all_queries

    specs = all_queries()
    order, latest = _queue_order(max_available_round())
    for name in order[:n]:
        gate = "oracle" if specs[name].oracle is not None else "rows"
        print(f"{name}  [{gate}, {latest.get(name, 'never')}]")


WINDOW_SIZE = 50
_WIN_BEGIN = "# --- BEGIN GENERATED WINDOW"
_WIN_END = "# --- END GENERATED WINDOW"


def compute_window(size: int = WINDOW_SIZE) -> list[str]:
    """The driver window the registry pins: the round's declared
    changed/new implementations first (`_CHANGED_THIS_ROUND`, <=5 by
    policy — first driver checks outrank re-verification), then the
    oldest-first re-sweep queue fills the remaining slots. Pure
    function of the registry + the CORRECTNESS files UP TO the
    ledger's stamped round, so the window is reproducible,
    test-pinned (VERDICT r9 #2), and STABLE across the driver's
    post-close CORRECTNESS_r{N} drop (ADVICE r10 #1: ranking against
    max_available_round() made the artifact-drop commit go red; the
    stamp only advances at the next round's first-commit
    regeneration, which also reruns --write-window)."""
    sys.path.insert(0, REPO)
    from mvrs_dspa_spark.plans.registry import (
        _CHANGED_THIS_ROUND,
        all_queries,
    )

    specs = all_queries()
    changed = [n for n in dict.fromkeys(_CHANGED_THIS_ROUND) if n in specs]
    try:
        with open(SURVEY) as f:
            through = stamped_round(f.read())
    except ValueError:
        through = max_available_round()
    order, _ = _queue_order(through)
    fill = [n for n in order if n not in set(changed)]
    return (changed + fill)[:size]


def write_window() -> int:
    """Rewrite the `_DRIVER_PRIORITY` tuple body between the GENERATED
    WINDOW markers in plans/registry.py."""
    path = os.path.join(REPO, "mvrs_dspa_spark", "plans", "registry.py")
    with open(path) as f:
        text = f.read()
    begin = text.index(_WIN_BEGIN)
    begin = text.index("\n", begin) + 1
    end = text.index(_WIN_END)
    names = compute_window()
    body = "_DRIVER_PRIORITY: tuple[str, ...] = (\n"
    body += "".join(f'    "{n}",\n' for n in names)
    body += ")\n"
    new_text = text[:begin] + body + text[end:]
    if new_text == text:
        print(f"registry window is up to date ({len(names)} names)")
        return 0
    with open(path, "w") as f:
        f.write(new_text)
    print(f"registry window regenerated ({len(names)} names)")
    return 0


if __name__ == "__main__":
    args = sys.argv[1:]
    if "--queue" in args:
        n = int(args[args.index("--queue") + 1])
        queue(n)
        sys.exit(0)
    if "--window" in args:
        for name in compute_window():
            print(name)
        sys.exit(0)
    if "--write-window" in args:
        sys.exit(write_window())
    sys.exit(apply(check_only="--check" in args))
