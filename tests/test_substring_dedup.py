"""Substring-level dedup pins (#122): a verbatim passage embedded in
two otherwise-distinct documents must be flagged on both, unique text
must not, and sub-window docs contribute nothing."""

from __future__ import annotations

import string

from mvrs_dspa_spark.operators.dedup import (
    SUBSTR_WINDOW,
    substring_dup_rate,
)

_PASSAGE = (
    "this exact licensing boilerplate paragraph is repeated verbatim "
    "across documents and must be detected as duplicated content"
)
assert len(_PASSAGE) >= SUBSTR_WINDOW


def _uniq(i: int, n: int = 400) -> str:
    # deterministic per-doc filler with no cross-doc 50-char repeats
    letters = string.ascii_lowercase
    return " ".join(
        f"u{i}w{j}" + letters[(i * 7 + j) % 26] * ((i + j) % 5 + 1)
        for j in range(n)
    )


def test_substring_dup_rate_flags_shared_passage(spark, tmp_path):
    docs = [
        (0, _uniq(0) + " " + _PASSAGE + " " + _uniq(10), "en", "s", 0),
        (1, _uniq(1) + " " + _PASSAGE + " " + _uniq(11), "en", "s", 0),
        (2, _uniq(2), "en", "s", 0),
        (3, "too short", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        [(i, t, la, so, len(t)) for i, t, la, so, _ in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = {r.doc_id: r for r in substring_dup_rate(spark, str(tmp_path)).collect()}
    assert 3 not in out, "doc shorter than the window emits no windows"
    assert out[0].n_shared > 0 and out[1].n_shared > 0
    assert out[2].n_shared == 0 and out[2].dup_rate == 0.0
    for r in out.values():
        assert 0.0 <= r.dup_rate <= 1.0
        assert r.n_shared <= r.n_windows


def test_doc_novelty_first_doc_and_duplicate(spark, tmp_path):
    """The first document is fully novel; an exact later duplicate of
    it contributes nothing new (novelty 0)."""
    from mvrs_dspa_spark.operators.dedup import doc_novelty_rate

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    other = (
        "one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen fifteen sixteen"
    )
    docs = [(0, base), (1, other), (2, base)]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = {r.doc_id: r for r in doc_novelty_rate(spark, str(tmp_path)).collect()}
    assert out[0].novelty_rate == 1.0
    assert out[1].novelty_rate == 1.0
    assert out[2].novelty_rate == 0.0
    assert out[2].n_shingles == out[0].n_shingles
