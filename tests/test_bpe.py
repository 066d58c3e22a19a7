"""BPE trainer: the distributed merge sequence must EXACTLY equal a
pure-python reference BPE (same word counts, same tiebreak), and the
structural invariants (non-increasing counts, greedy non-overlap)
must hold."""

from __future__ import annotations

import pytest

from collections import Counter

from pyspark.sql import functions as F

from mvrs_dspa_spark.functions import text as T
from mvrs_dspa_spark.operators.bpe import bpe_train, bpe_train_merges
from mvrs_dspa_spark.tables import table

SF = "/root/testdata/sf0.001"


def _python_bpe(word_freq: dict[str, int], rounds: int):
    """Reference BPE with identical semantics: greedy left-to-right
    non-overlapping merges, tiebreak (count desc, left, right)."""
    syms = {w: [c for c in w] for w in word_freq}
    merges = []
    for r in range(rounds):
        counts: Counter = Counter()
        for w, freq in word_freq.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += freq
        if not counts:
            break
        # deterministic tiebreak: count desc, then lexicographically
        # SMALLEST (left, right)
        best_count = max(counts.values())
        cands = sorted(
            [p for p, c in counts.items() if c == best_count]
        )
        left, right = cands[0]
        merges.append((r, left, right, best_count))
        merged = left + right
        for w in syms:
            s = syms[w]
            out: list[str] = []
            i = 0
            while i < len(s):
                if (
                    out
                    and out[-1] == left
                    and s[i] == right
                ):
                    out[-1] = merged
                else:
                    out.append(s[i])
                i += 1
            syms[w] = out
    return merges


def _word_freq(spark) -> dict[str, int]:
    rows = (
        table(spark, SF, "documents")
        .select(F.explode(T.tokens_col(F.col("text"))).alias("w"))
        .groupBy("w")
        .count()
        .collect()
    )
    return {r.w: r["count"] for r in rows}


def test_bpe_matches_python_reference(spark):
    wf = _word_freq(spark)
    want = _python_bpe(wf, 16)
    got = [
        (r.merge_round, r.left, r.right, r.weighted_count)
        for r in bpe_train(spark, SF).collect()
    ]
    assert got == want


def test_bpe_counts_non_increasing(spark):
    rows = bpe_train(spark, SF).collect()
    assert len(rows) > 4
    counts = [r.weighted_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    # merged symbol is always left+right
    assert all(r.merged == r.left + r.right for r in rows)


def test_bpe_merge_fold_greedy_non_overlap(spark):
    """'aaaa' with merge (a,a) must become [aa, aa] (non-overlapping),
    and merged symbols must not re-merge within the same round."""
    from mvrs_dspa_spark.operators.bpe import _merge_fold

    df = spark.createDataFrame(
        [(["a", "a", "a", "a"],), (["a", "a", "a"],), (["b", "a"],)],
        "symbols array<string>",
    )
    out = [
        r.m for r in df.select(
            _merge_fold(F.col("symbols"), "a", "a").alias("m")
        ).collect()
    ]
    assert out == [["aa", "aa"], ["aa", "a"], ["b", "a"]]


def test_bpe_encode_round_trips_and_compresses(spark):
    """Every word must reassemble exactly from its pieces, and 16
    merges must strictly reduce total piece count vs characters."""
    from mvrs_dspa_spark.operators.bpe import bpe_encode_vocab

    wf = _word_freq(spark)
    vocab = spark.createDataFrame(list(wf.items()), "w string, freq long")
    merges = bpe_train_merges(vocab, rounds=16)
    enc = bpe_encode_vocab(vocab, merges).collect()
    assert len(enc) == len(wf)
    total_pieces = 0
    total_chars = 0
    for r in enc:
        assert "".join(r.symbols) == r.w, r
        assert r.n_pieces == len(r.symbols)
        total_pieces += r.n_pieces * r.freq
        total_chars += len(r.w) * r.freq
    assert total_pieces < total_chars, "merges did not compress"


@pytest.mark.slow  # >10 s: slow tier, run with -m slow
def test_tokenizer_fertility_invariants(spark, sf_small):
    """Fertility >= 1 (a word is at least one piece), char totals are
    conserved, and applying MORE merges never increases any
    language's token count (each merge only fuses adjacent pieces)."""
    from pyspark.sql import functions as F

    from mvrs_dspa_spark.functions import text as T
    from mvrs_dspa_spark.operators.bpe import (
        bpe_encode_vocab,
        bpe_train_merges,
        tokenizer_fertility,
    )
    from mvrs_dspa_spark.tables import table

    out = tokenizer_fertility(spark, sf_small).collect()
    assert len(out) > 0
    for r in out:
        assert r.fertility >= 1.0
        assert r.n_tokens >= r.n_words
        assert r.chars_per_token >= 1.0

    d = table(spark, sf_small, "documents")
    lang_w = (
        d.select("lang", F.explode(T.tokens_col(F.col("text"))).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    vocab = lang_w.groupBy("w").agg(F.sum("n").alias("freq"))
    merges = bpe_train_merges(vocab)

    def tokens_with(ms):
        enc = bpe_encode_vocab(vocab, ms).select("w", "n_pieces")
        return {
            r.lang: r.t
            for r in lang_w.join(enc, "w")
            .groupBy("lang")
            .agg(F.sum(F.col("n") * F.col("n_pieces")).alias("t"))
            .collect()
        }

    few, full = tokens_with(merges[:4]), tokens_with(merges)
    assert set(few) == set(full)
    for lang in full:
        assert full[lang] <= few[lang], lang


def test_bpe_separator_words_dropped_identically(spark):
    """ADVICE r9: \\x1f is NOT whitespace, so a hostile corpus token
    can carry it into the vocabulary; both the Spark trainer and the
    SQL merge chain must drop such words (identically) instead of the
    oracle's delimiter arithmetic silently desyncing."""
    import duckdb

    from mvrs_dspa_spark.operators.bpe import _SEP, _bpe_chain_ctes

    clean = [("aab", 5), ("abab", 3), ("bb", 2)]
    dirty = clean + [(f"a{_SEP}b", 100)]  # would dominate every argmax
    rounds = 3

    def spark_merges(rows):
        vocab = spark.createDataFrame(rows, "w string, freq long")
        return bpe_train_merges(vocab, rounds=rounds)

    assert spark_merges(dirty) == spark_merges(clean)
    assert len(spark_merges(clean)) > 0

    vals = ", ".join(
        f"('{w.replace(chr(31), chr(39) + ' || chr(31) || ' + chr(39))}', {f})"
        if chr(31) in w
        else f"('{w}', {f})"
        for w, f in dirty
    )
    vocab_sql = f"SELECT * FROM (VALUES {vals}) t(w, freq)"
    ctes, tops = _bpe_chain_ctes(rounds, vocab_sql)
    sql = (
        "WITH " + ",\n".join(ctes) + "\nSELECT * FROM (\n"
        + "\nUNION ALL ".join(tops) + "\n) ORDER BY merge_round"
    )
    got = duckdb.connect().execute(sql).fetchall()
    want = [
        (r, lt, rt, lt + rt, c) for r, lt, rt, c in spark_merges(clean)
    ]
    assert got == want
