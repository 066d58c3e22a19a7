"""Multimodal binary-column plumbing: schema, mapInPandas stages,
decode gating (SURVEY §2f #41)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from mvrs_dspa_spark.operators import multimodal as mm


def _media_df(spark):
    rows = [
        Row(
            media_id=i,
            kind="video" if i % 3 == 0 else ("audio" if i % 3 == 1 else "image"),
            payload=bytes([i % 251]) * (100 + i),
            width=64,
            height=48,
            sample_rate=16_000,
            n_frames=20 if i % 3 == 0 else 0,
        )
        for i in range(12)
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_feature_extraction_shape_and_determinism(spark):
    df = _media_df(spark)
    feats = mm.extract_features(df).collect()
    assert len(feats) == 12
    for r in feats:
        assert len(r.feature) == mm.FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in r.feature)
        assert r.n_bytes == 100 + r.media_id
    again = {r.media_id: list(r.feature) for r in mm.extract_features(df).collect()}
    first = {r.media_id: list(r.feature) for r in feats}
    assert again == first  # decode stub is deterministic

    # payload must NOT survive into the feature frame (projected away)
    assert "payload" not in mm.extract_features(df).columns


def test_real_decode_is_gated(spark):
    df = _media_df(spark)
    with pytest.raises(Exception) as ei:
        mm.extract_features(df, decode="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sampling(spark):
    df = _media_df(spark)
    frames = mm.sample_frames(df, every_n=10).collect()
    videos = {r.media_id for r in frames}
    assert videos == {0, 3, 6, 9}  # only kind == video
    per_vid = {}
    for r in frames:
        per_vid.setdefault(r.media_id, []).append(r.frame_idx)
        assert isinstance(r.frame_payload, (bytes, bytearray))
        assert len(r.frame_payload) > 0
    assert all(sorted(v) == [0, 10] for v in per_vid.values())  # 20 frames / 10


def test_media_features_registered_query_deterministic(spark, sf_small):
    """The driver-visible media_features query: full coverage, stable
    values, and the Arrow-stage output must equal a driver-side
    reference computation of the same fake codec."""
    import hashlib

    import numpy as np

    from mvrs_dspa_spark.operators.multimodal import media_features
    from mvrs_dspa_spark.tables import table

    rows = media_features(spark, sf_small).collect()
    docs = {r.doc_id: r.text for r in table(spark, sf_small, "documents").collect()}
    assert len(rows) == len(docs)
    assert all(r.n_bytes == 64 for r in rows)
    assert all(0.0 <= r.f0 < 1.0 for r in rows)
    # re-run: identical (pure function of the data)
    again = media_features(spark, sf_small).collect()
    assert rows == again
    # value-pin a sample against a plain-Python reference (ids 0/1
    # derive from the pinned duplicate constant, not their text)
    for r in rows[:5]:
        content = (
            "__pinned_dup_payload__" if r.media_id <= 1 else docs[r.media_id]
        )
        payload = b"".join(
            hashlib.md5((content + f":chunk{i}").encode()).digest()
            for i in range(4)
        )
        h = hashlib.sha256(payload.hex().encode()).digest()
        raw = np.frombuffer((h * ((16 * 4) // len(h) + 1))[: 16 * 4], dtype="<u4")
        assert r.f0 == float((raw % 10_000)[0]) / 10_000.0


def test_phash_pairs_pigeonhole(spark):
    """Banding is lossless for Hamming <= 3 (4 bands over 32 bits):
    a 2-bit neighbor MUST pair, a 3-bit neighbor concentrated in one
    band must pair, a 4-bits-across-all-bands neighbor must NOT
    (exceeds the radius), and an unrelated hash must not."""
    from mvrs_dspa_spark.operators.multimodal import phash_pairs

    base = 0x12345678
    rows = [
        (1, "image", base),
        (2, "image", base ^ 0b101),            # hamming 2 -> pair
        (3, "image", base ^ 0x07000000),       # hamming 3, one band -> pair
        (4, "image", base ^ 0x01010101),       # hamming 4, all bands differ
        (5, "image", 0x0F0F0F0F),              # unrelated
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, phash long")
    got = {
        (r.id_a, r.id_b): r.hamming for r in phash_pairs(df).collect()
    }
    assert got[(1, 2)] == 2
    assert got[(1, 3)] == 3
    assert (1, 4) not in got
    assert all(h <= 3 for h in got.values())
    assert not any(5 in pair for pair in got)


def test_media_phash_dedup_detects_exact_payload_dup(spark, tmp_path):
    """media_id 0 and 1 derive their payload from a pinned constant,
    so the registered query returns >= 1 pair on ANY corpus (the r6
    driver row was vacuously green at 0 rows); documents with
    identical text (ids > 1) must also pair at Hamming 0."""
    from mvrs_dspa_spark.operators.multimodal import media_phash_dedup

    docs = [
        (0, "text ignored for pinned ids", "en", "s"),
        (1, "also ignored for pinned ids", "en", "s"),
        (2, "the same media payload text", "en", "s"),
        (3, "the same media payload text", "en", "s"),
        (4, "completely different content here", "en", "s"),
    ]
    spark.createDataFrame(
        [(i, t, la, so, len(t)) for i, t, la, so in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = [
        (r.id_a, r.id_b, r.hamming)
        for r in media_phash_dedup(spark, str(tmp_path)).collect()
    ]
    assert out == [(0, 1, 0), (2, 3, 0)]


def test_media_phash_dedup_nonvacuous_on_sf_corpus(spark, sf_small):
    """The planted (0, 1) duplicate keeps the driver gate non-vacuous
    on the real testdata: a broken band join / hash stage can no
    longer hide behind an empty-but-clean result."""
    from mvrs_dspa_spark.operators.multimodal import media_phash_dedup

    rows = media_phash_dedup(spark, sf_small).collect()
    assert any(
        (r.id_a, r.id_b, r.hamming) == (0, 1, 0) for r in rows
    ), rows
