"""Mechanical guard for the float-summation-order class (SURVEY §5
house rule; cost three rounds: r3 embedding_quantize, r5 embedding_pq,
r6 doc_stopword_entropy): any oracle-gated plan whose SUM aggregates a
double produced by a transcendental (log/exp/sqrt/pow) diverges between
engines/builds because summation ORDER is unspecified. The fix is
always the int-code pattern — `cast(round(term * 1eK) as bigint)`
before the SUM, divide once after.

This lint walks every oracle-gated query's OPTIMIZED plan, extracts
each `sum(...)` argument (aggregate and window forms), expands
attribute lineage through Project nodes, and fails if a transcendental
appears in the summed expression without an enclosing cast-to-bigint.
"""

from __future__ import annotations

import re

import pytest

from mvrs_dspa_spark.plans.registry import all_queries

# Transcendental tokens as they print in Spark optimized plans.
_TRANS = re.compile(r"\b(LOG2|LOG10|LOG|LN|EXP|SQRT|POWER|POW)\(")

# Queries allowed to sum transcendental doubles. Each entry needs a
# PROOF of order-independence, not just "has been green".
_ALLOWLIST: dict[str, str] = {
    # HLL harmonic-mean estimator: each term is POWER(2, -m_j) with
    # integer m_j in [0, ~40] — an exact dyadic rational. Partial sums
    # of <=512 such terms span < 50 mantissa bits, so every partial
    # sum is exactly representable and the total is bit-identical
    # under ANY summation order. Driver-green r4.
    "hll_user_counts": "exact dyadic 2^-m terms; order-free by construction",
    "sliding_distinct_users_hll": (
        "exact dyadic 2^-m terms; order-free by construction"
    ),
}

_ATTR = re.compile(r"\b([A-Za-z_][\w]*)#(\d+)L?\b")


def _expr_start(text: str, end: int) -> int:
    """Scan backward from `end` to the start of the one-line plan
    expression: the nearest ',' / '[' / unmatched '(' at depth 0."""
    depth = 0
    i = end - 1
    while i >= 0:
        ch = text[i]
        if ch == ")":
            depth += 1
        elif ch == "(":
            if depth == 0:
                return i + 1
            depth -= 1
        elif ch in ",[\n" and depth == 0:
            return i + 1
        i -= 1
    return 0


def _balanced_arg(text: str, open_paren: int) -> str:
    """Return the balanced-paren argument starting at text[open_paren]
    (which must be '(')."""
    depth = 0
    for j in range(open_paren, len(text)):
        if text[j] == "(":
            depth += 1
        elif text[j] == ")":
            depth -= 1
            if depth == 0:
                return text[open_paren + 1 : j]
    return text[open_paren + 1 :]


def _definitions(plan: str) -> dict[str, str]:
    """Map 'name#id' -> defining expression text from ' AS name#id'."""
    defs: dict[str, str] = {}
    for m in re.finditer(r" AS ([A-Za-z_][\w]*)#(\d+)L?\b", plan):
        key = f"{m.group(1)}#{m.group(2)}"
        start = _expr_start(plan, m.start())
        defs[key] = plan[start : m.start()].strip()
    return defs


def _expand(expr: str, defs: dict[str, str], depth: int = 0) -> str:
    if depth >= 8:
        return expr
    out = []
    last = 0
    for m in _ATTR.finditer(expr):
        key = f"{m.group(1)}#{m.group(2)}"
        sub = defs.get(key)
        out.append(expr[last : m.start()])
        if sub is not None and sub != key:
            out.append("(" + _expand(sub, defs, depth + 1) + ")")
        else:
            out.append(m.group(0))
        last = m.end()
    out.append(expr[last:])
    return "".join(out)


def _int_code_spans(expr: str) -> list[tuple[int, int]]:
    """Spans of cast(... as bigint) / cast(... as int) wrappers."""
    spans = []
    for m in re.finditer(r"\bcast\(", expr):
        arg_open = m.end() - 1
        depth = 0
        for j in range(arg_open, len(expr)):
            if expr[j] == "(":
                depth += 1
            elif expr[j] == ")":
                depth -= 1
                if depth == 0:
                    inner = expr[arg_open : j + 1]
                    if re.search(r"as (bigint|int|smallint)\)?\s*$", inner):
                        spans.append((m.start(), j + 1))
                    break
    return spans


def _sum_result_is_integral(plan: str, open_paren: int) -> bool:
    """True when the sum's RESULT attribute is long (`AS name#123L`) —
    i.e. the summed expression is integral, so the sum is exact and
    order-free even if a transcendental appears in the lineage (it
    only influenced WHICH integer, a selection concern covered by the
    round-before-rank house rule, not a summation-order one)."""
    depth = 0
    j = open_paren
    while j < len(plan):
        if plan[j] == "(":
            depth += 1
        elif plan[j] == ")":
            depth -= 1
            if depth == 0:
                break
        j += 1
    m = re.match(
        r"(?:\s+windowspecdefinition\(.*?\))?\s+AS\s+[\w]+#\d+(L?)\b",
        plan[j + 1 : j + 400],
        re.DOTALL,
    )
    return bool(m and m.group(1) == "L")


def _violations(plan: str) -> list[str]:
    defs = _definitions(plan)
    bad = []
    for m in re.finditer(r"\bsum\(", plan):
        if _sum_result_is_integral(plan, m.end() - 1):
            continue
        arg = _balanced_arg(plan, m.end() - 1)
        # A bare long attribute sums exactly whatever its lineage —
        # any transcendental upstream already passed through a
        # cast-to-integral (or only steered ORDER BY / selection,
        # which the round-before-rank rule owns).
        if re.fullmatch(r"\s*[\w]+#\d+L\s*", arg):
            continue
        expanded = _expand(arg, defs)
        spans = _int_code_spans(expanded)
        for t in _TRANS.finditer(expanded):
            if not any(a <= t.start() < b for a, b in spans):
                bad.append(
                    f"sum over transcendental double: sum({arg[:80]}...) "
                    f"-> ...{expanded[max(0, t.start() - 40) : t.end() + 20]}..."
                )
                break
    return bad


_ORACLE_QUERIES = sorted(
    name for name, spec in all_queries().items() if spec.oracle is not None
)


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_no_raw_transcendental_sums(spark, sf_small, name):
    if name in _ALLOWLIST:
        pytest.skip(_ALLOWLIST[name])
    df = all_queries()[name].fn(spark, sf_small)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    bad = _violations(plan)
    assert not bad, (
        f"{name}: SUM of a transcendental-produced double — summation "
        f"order differs across engines (house int-code rule, SURVEY §5). "
        f"Code each term with cast(round(term * 1eK) as bigint) before "
        f"the SUM on BOTH engines. Details: {bad}"
    )


def test_lint_catches_the_old_form(spark):
    """The lint must fail on exactly the shape that shipped red in r6
    (raw -p*log2(p) sum) and pass on the int-coded fix."""
    from pyspark.sql import functions as F

    df = spark.range(2, 10).select(F.col("id").cast("double").alias("x"))
    old = df.groupBy(F.lit(1).alias("g")).agg(
        F.sum(-F.col("x") * F.log2("x")).alias("e")
    )
    fixed = df.groupBy(F.lit(1).alias("g")).agg(
        (
            F.sum(F.round(-F.col("x") * F.log2("x") * 1e9).cast("long"))
            / 1e9
        ).alias("e")
    )
    assert _violations(old._jdf.queryExecution().optimizedPlan().toString())
    assert not _violations(
        fixed._jdf.queryExecution().optimizedPlan().toString()
    )
