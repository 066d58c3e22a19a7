"""Count-min sketch invariants (operators/sketches.py).

The oracle gate already pins cross-engine equality; these tests pin
the SKETCH guarantees that equality alone doesn't express:
- overestimate: est >= exact for every token (CMS never undercounts);
- grid bound: the sketch has at most D*W cells whatever the input;
- mass: every hash row sums to the total token count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mvrs_dspa_spark.functions import text as T
from mvrs_dspa_spark.operators import sketches as S
from mvrs_dspa_spark.tables import table


def _toks(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return d.select(F.explode(T.tokens_col(F.col("text"))).alias("t"))


def test_cms_overestimates_every_token(spark, sf_medium):
    out = S.cms_heavy_hitters(spark, sf_medium).collect()
    assert len(out) > 0
    for r in out:
        assert r.est_count >= r.exact_count, r


def test_cms_grid_bounded_and_mass_conserved(spark, sf_medium):
    toks = _toks(spark, sf_medium)
    n_tokens = toks.count()
    cells = S.cms_sketch(toks).collect()
    assert len(cells) <= S.CMS_D * S.CMS_W
    by_row: dict[int, int] = {}
    for c in cells:
        by_row[c.j] = by_row.get(c.j, 0) + c.c
    assert set(by_row) == set(range(S.CMS_D))
    for j in range(S.CMS_D):
        assert by_row[j] == n_tokens


def test_cms_error_bound(spark, sf_medium):
    """Worst-case CMS error over D independent rows: with W buckets the
    expected per-row collision mass is N/W; require the observed error
    to stay under the (loose, deterministic-data) bound 4*N/W."""
    toks = _toks(spark, sf_medium)
    n_tokens = toks.count()
    out = S.cms_heavy_hitters(spark, sf_medium).collect()
    bound = 4.0 * n_tokens / S.CMS_W
    for r in out:
        assert r.est_count - r.exact_count <= bound, (r, bound)
