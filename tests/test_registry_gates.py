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


def test_every_oracle_is_plausible_sql():
    """Cheap structural lint on the oracle texts: each is non-empty
    SQL over at least one registered table. (Column-name agreement —
    the driver hashes by name — is enforced at runtime by
    test_oracle_parity.)"""
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


def test_every_priority_name_is_registered():
    """Round-5 regression guard: names in _DRIVER_PRIORITY that never
    got a register() call are silently dropped by all_queries(), so a
    typo'd (or promised-but-unimplemented) name steals a driver slot
    from a real query without any signal. Every priority name must
    resolve."""
    from mvrs_dspa_spark.plans.registry import _DRIVER_PRIORITY

    registered = set(all_queries())
    phantom = [n for n in _DRIVER_PRIORITY if n not in registered]
    assert not phantom, f"_DRIVER_PRIORITY names without a registration: {phantom}"
