"""Every registered query must carry a correctness gate: a DuckDB
oracle, or an explicit 'rows_gate' tag documenting that it is
rows-only by design (approximate/iterative) and pinned by pytest
invariants instead. Prevents accidental untested registrations as
the registry grows (VERDICT r2 'Next round' #9)."""

from __future__ import annotations

from mvrs_dspa_spark.plans.registry import all_queries


def test_every_query_has_oracle_or_declared_rows_gate():
    missing = [
        name
        for name, spec in all_queries().items()
        if spec.oracle is None and "rows_gate" not in spec.tags
    ]
    assert not missing, (
        f"queries registered without an oracle or a declared rows_gate "
        f"tag: {missing}"
    )


def test_rows_gate_is_the_exception_not_the_rule():
    specs = all_queries().values()
    gated = sum(1 for s in specs if s.oracle is None)
    # the oracle-checked surface must stay the overwhelming majority
    assert gated / len(specs) < 0.2, (gated, len(specs))


def test_every_oracle_names_no_unaliased_aggregate():
    """The driver compare is column-NAME sensitive: a bare aggregate
    like sum(x) would hash-mismatch Spark's aliased column even with
    identical values. Cheap lint: no 'AS'-less top-level aggregates
    sneaking in is hard to check syntactically, but unnamed DuckDB
    columns render with '(' in the name — assert none of the oracle
    texts ends a SELECT list item without aliasing by checking the
    canary characters never appear in snake_case output names is
    done at runtime by test_oracle_parity; here we just pin that
    every oracle is non-empty SQL mentioning a known table."""
    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    for name, spec in all_queries().items():
        if spec.oracle is None:
            continue
        low = spec.oracle.lower()
        assert "select" in low, name
        assert any(t in low for t in tables), name
