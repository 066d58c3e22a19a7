"""Every oracle-gated query must match DuckDB at sf0.01 — the same
check the round driver runs (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from mvrs_dspa_spark.plans.registry import all_queries
from tests.oracle_harness import compare

ORACLE_QUERIES = sorted(
    name for name, spec in all_queries().items() if spec.oracle is not None
)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_medium, name):
    compare(spark, sf_medium, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
