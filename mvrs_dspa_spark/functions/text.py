"""Shared text primitives with exact Spark/DuckDB mirrors.

Tokenization is whitespace splitting with empty-token filtering (the
reference uses a guava whitespace Splitter with omitEmptyStrings —
`jobs/clustering/UnusualActivityDetectionJob.scala:440-448`). All
derived features stay in rational arithmetic (no transcendentals) so
both engines produce bit-identical doubles after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mvrs_dspa_spark.functions import hashing as H

# BPE-ish token pattern: lowercase runs, Capitalized runs, short digit
# groups, single punctuation — identical semantics in Java regex & RE2.
BPE_PATTERN = "[a-z]+|[A-Z][a-z]*|[0-9]{1,3}|[^a-zA-Z0-9\\s]"

STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ich", "zu"),
    "es": ("el", "los", "las", "y", "es", "no", "que", "por"),
    "fr": ("le", "la", "les", "et", "est", "je", "ne", "pas"),
    "zh": ("的", "是", "了", "我", "不", "在", "人", "有"),
}
LANG_ORDER = ("en", "de", "es", "fr", "zh")  # argmax tiebreak priority


def tokens_col(text: Column) -> Column:
    # array_remove(split, '') is bit-identical to filter(t -> t != '')
    # here (split never yields NULLs) but is a regular codegen
    # expression, while filter() is a higher-order function that Spark
    # evaluates interpreted on every corpus row (r11, guide §4.1)
    return F.array_remove(F.split(text, "\\s+"), "")


def tokens_sql(text: str) -> str:
    return f"list_filter(string_split_regex({text}, '\\s+'), t -> t <> '')"


def stopword_hits_col(tokens: Column, lang: str) -> Column:
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens, lambda t: F.array_contains(words, t)))


def stopword_hits_sql(tokens: str, lang: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({tokens}, t -> t IN ({inlist})))"


def fingerprint_col(tokens: Column, a: int, b: int) -> Column:
    """Order/multiplicity-insensitive doc fingerprint: sum of affine
    hashes of distinct-token char codes, mod P."""
    hashed = F.transform(
        F.array_distinct(tokens), lambda t: H.affine_col(H.str_code_col(t), a, b)
    )
    return (
        F.aggregate(hashed, F.lit(0).cast("long"), lambda acc, x: acc + x) % F.lit(H.P)
    )


def fingerprint_sql(tokens: str, a: int, b: int) -> str:
    inner = H.affine_sql(H.str_code_sql("t"), a, b)
    return (
        f"(list_sum(list_transform(list_distinct({tokens}), t -> {inner})) % {H.P})"
    )
