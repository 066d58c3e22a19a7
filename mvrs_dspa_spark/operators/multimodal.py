"""Multimodal (image/audio/video) column plumbing (SURVEY §2f #41).

A 100 TB training-data pipeline carries media as opaque ``binary``
payload columns plus typed metadata, and runs decode / feature
extraction / resizing / frame sampling as Arrow-batched Python stages.
This module provides the Spark-side plumbing — schema, partition-size
control, `mapInPandas` stage shape. `decode=` defaults to a
deterministic fake decoder so every downstream stage is fully
testable and the registered driver-checked query stays byte-stable.
Since r10, `decode="real"` is a GENUINE pure-numpy codec path for the
containers that need no external libraries — uncompressed 24-bit BMP
and PCM-16 WAV (`operators/media_codecs.py`: decode, feature
extraction, nearest-neighbor resize, 8x8 aHash) — while compressed
formats (JPEG/PNG/MP3/MP4) still raise NotImplementedError at the
per-payload boundary where PIL/ffmpeg would plug in.

Scale notes: payloads never pass through the driver; binary columns
ride Arrow record batches executor-side. `target_records_per_batch`
bounds Arrow batch memory (payloads can be MBs each, so the default
10k-row Arrow batch would OOM — set
spark.sql.execution.arrow.maxRecordsPerBatch accordingly in prod).
Feature extraction projects the payload away as early as possible so
downstream shuffles move only small feature vectors.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, feature array<float>"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame_payload binary"


def _fake_decode_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decode+embed: sha256 of the
    payload expanded to FEATURE_DIM floats in [0, 1)."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype="<u4")
    return (raw % 10_000).astype("float32") / 10_000.0


def extract_features(df: DataFrame, decode: str = "fake") -> DataFrame:
    """payload -> fixed-width feature vector via mapInPandas.

    The Arrow batch iterator shape (Iterator[pd.DataFrame] ->
    Iterator[pd.DataFrame]) is the real production plumbing; only the
    per-payload `_fake_decode_features` call swaps for a codec.
    """
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode == "real":
            # r10: genuine pure-numpy codec path for uncompressed BMP
            # and PCM-16 WAV (operators/media_codecs.py); per-payload
            # NotImplementedError remains for containers that need
            # PIL/ffmpeg. Pytest-only surface, so the worker-side
            # import of this package is acceptable here (the
            # registered fake path stays self-contained).
            from mvrs_dspa_spark.operators.media_codecs import (
                real_features,
            )

            decode_fn = real_features
        else:
            decode_fn = _fake_decode_features
        for pdf in batches:
            feats = [decode_fn(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    # project payload-bearing columns only into the Python stage; the
    # feature output is small, so everything after this is cheap.
    return df.select("media_id", "kind", "payload").mapInPandas(
        stage, schema=FEATURES_SCHEMA
    )


def sample_frames(df: DataFrame, every_n: int = 10, decode: str = "fake") -> DataFrame:
    """video payload -> every_n-th frame payloads (explode-style stage).

    Demonstrates the 1->N mapInPandas shape (frame extraction, audio
    chunking). Fake decoder slices the payload into n_frames equal
    chunks; a real one calls ffmpeg per Arrow batch.
    """

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError("real frame extraction needs ffmpeg")
            out_id, out_idx, out_payload = [], [], []
            for mid, payload, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"]
            ):
                n = max(int(n_frames or 0), 0)
                if n == 0:
                    continue
                step = max(len(payload) // n, 1)
                for i in range(0, n, every_n):
                    out_id.append(mid)
                    out_idx.append(i)
                    out_payload.append(bytes(payload[i * step : (i + 1) * step]))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_id, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_payload": pd.Series(out_payload, dtype="object"),
                }
            )

    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "payload", "n_frames")
        .mapInPandas(stage, schema=FRAME_SCHEMA)
    )


def resize_images(
    df: DataFrame, out_w: int, out_h: int, decode: str = "real"
) -> DataFrame:
    """image payload -> resized image payload (the 1->1 transform
    stage of the media pipeline). `decode="real"` decodes uncompressed
    BMP, nearest-neighbor resizes, and re-encodes BMP (pure numpy —
    operators/media_codecs.py); other containers raise where
    PIL/ffmpeg would plug in. `decode="fake"` exercises only the
    plumbing: payload passes through untouched with the target
    dimensions stamped into the metadata columns."""
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                from mvrs_dspa_spark.operators.media_codecs import (
                    decode_bmp,
                    encode_bmp,
                    resize_rgb,
                )

                payloads = [
                    encode_bmp(resize_rgb(decode_bmp(bytes(p)), out_w, out_h))
                    for p in pdf["payload"]
                ]
            else:
                payloads = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pd.Series(payloads, dtype="object"),
                    "width": pd.Series([out_w] * len(pdf), dtype="int32"),
                    "height": pd.Series([out_h] * len(pdf), dtype="int32"),
                }
            )

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(
            stage,
            schema="media_id long, payload binary, width int, height int",
        )
    )


def with_arrow_batch_bound(df: DataFrame, max_records: int = 64) -> DataFrame:
    """Repartition so Arrow batches of large payloads stay memory-bounded.

    Production sets spark.sql.execution.arrow.maxRecordsPerBatch; this
    helper additionally right-sizes partitions for payload-heavy scans
    (a 128 MB parquet split of 5 MB payloads is ~25 rows — fine; a
    row-group of small thumbnails can be 100k rows — not fine).
    """
    n = max(df.rdd.getNumPartitions(), 1)
    approx_rows = df.sparkSession.conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch", "10000"
    )
    if int(approx_rows) > max_records:
        df.sparkSession.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(max_records)
        )
    return df.repartition(n)


# --- driver-visible query over synthesized media ---------------------------
#
# The testdata has no binary media table, so the registered query
# synthesizes one deterministically from `documents` (payload = 64
# bytes of md5-derived content per doc) and runs the Arrow
# feature-extraction stage over it. This keeps the mapInPandas
# plumbing on the driver-checked surface rather than pytest-only.
# NOTE: the stage below is deliberately self-contained (locals +
# stdlib/numpy/pandas only) so cloudpickle ships it by value and
# executors never need this package importable (driver may run from
# any cwd).

from mvrs_dspa_spark.plans.registry import register
from mvrs_dspa_spark.tables import table as _table


def synth_media(spark, sf_dir: str) -> DataFrame:
    """Deterministic binary media table from documents (64-byte
    md5-derived payloads, kind image/audio/video) — shared by the
    driver-checked media queries. Identical document text yields an
    identical payload, so exact-dup docs become exact-dup MEDIA
    payloads. media_id 0 and 1 additionally derive their payload from
    a pinned constant rather than their text: the corpus is not
    guaranteed to contain byte-identical texts at every SF, and
    without a planted duplicate the `media_phash_dedup` driver row
    returns 0 rows — a vacuously-green gate that can't catch a broken
    band join (VERDICT r6 'What's wrong' #2)."""
    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    content = F.when(
        F.col("doc_id") <= 1, F.lit("__pinned_dup_payload__")
    ).otherwise(F.col("text"))
    payload = F.concat(
        *[
            F.unhex(F.md5(F.concat(content, F.lit(f":chunk{i}"))))
            for i in range(4)
        ]
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
    )


# sha256 over the HEX encoding of the 64-byte payload: identical
# discriminative power for a fake codec, and DuckDB 1.0's sha256 only
# accepts VARCHAR — hex keeps the whole fake-feature pipeline
# oracle-expressible (the same trade media_phash documents below).
# The hex of the synthesized payload IS the md5-chunk concatenation.
_MEDIA_HEX_SQL = " || ".join(f"md5(c || ':chunk{i}')" for i in range(4))


@register(
    "media_features",
    oracle=f"""
        WITH content AS (
            SELECT doc_id AS media_id,
                   CASE WHEN doc_id <= 1 THEN '__pinned_dup_payload__'
                        ELSE text END AS c
            FROM documents
        ),
        hx AS (
            SELECT media_id, {_MEDIA_HEX_SQL} AS h FROM content
        ),
        digests AS (
            SELECT media_id,
                   CAST(length(h) // 2 AS BIGINT) AS n_bytes,
                   sha256(h) AS d
            FROM hx
        )
        SELECT media_id,
               (['image', 'audio', 'video'])[
                   CAST(media_id % 3 AS INTEGER) + 1] AS kind,
               n_bytes,
               CAST(CAST(('0x' || substr(d, 7, 2) || substr(d, 5, 2)
                          || substr(d, 3, 2) || substr(d, 1, 2)) AS BIGINT)
                    % 10000 AS DOUBLE) / 10000.0 AS f0
        FROM digests
        ORDER BY media_id
    """,
    doc="Multimodal feature extraction on the driver-checked surface: "
    "synthesize a binary media table from documents (64-byte "
    "md5-derived payloads, kind image/audio/video), run the Arrow "
    "mapInPandas decode->feature stage (fake codec), project the "
    "payload away. Payloads never touch the driver. r11 rows->oracle "
    "conversion: the fake feature hashes the payload's HEX encoding "
    "(media_phash's documented trade — DuckDB sha256 is VARCHAR-only), "
    "so f0 = little-endian u32 of the digest head mod 1e4 is exact on "
    "both engines.",
    tags=("multimodal", "llm"),
)
def media_features(spark, sf_dir: str) -> DataFrame:
    media = synth_media(spark, sf_dir)

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as _np
        import pandas as _pd

        dim = 16
        for pdf in batches:
            f0 = []
            for p in pdf["payload"]:
                h = hashlib.sha256(bytes(p).hex().encode()).digest()
                raw = _np.frombuffer(
                    (h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype="<u4"
                )
                f0.append(float((raw % 10_000)[0]) / 10_000.0)
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "f0": _pd.Series(f0, dtype="float64"),
                }
            )

    return (
        media.mapInPandas(stage, schema="media_id long, kind string, n_bytes long, f0 double")
        .orderBy("media_id")
    )


# --- perceptual-hash media near-dup -----------------------------------------

PHASH_BITS = 32
PHASH_BANDS = 4  # 4 bands x 8 bits: lossless for hamming <= 3 (pigeonhole)
PHASH_HAMMING_MAX = 3


def media_phash(media: DataFrame, decode: str = "fake") -> DataFrame:
    """(media_id, kind, phash) via the Arrow mapInPandas stage — the
    pHash twin of `extract_features`. The fake codec hashes the raw
    payload (so only exact payloads collide); a real one decodes to
    pixels, downsamples to 8x8, and thresholds against the median
    (classic aHash/pHash), making VISUALLY similar media collide."""
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        for pdf in batches:
            if decode == "real":
                # r10: real aHash for decodable (BMP) payloads — 8x8
                # nearest-neighbor downsample, median threshold; the
                # classic perceptual hash, so visually-similar images
                # collide. Truncated (NOT xor-folded — folding maps an
                # image and its negative to the same value) to
                # PHASH_BITS so it rides the same hamming-local band
                # join as the fake path. Non-image rows were filtered
                # out below (ADVICE r10 #2: the mixed media table
                # would otherwise die on the first WAV payload).
                from mvrs_dspa_spark.operators.media_codecs import (
                    ahash64,
                )

                mask = (1 << PHASH_BITS) - 1
                ph = [ahash64(p) & mask for p in pdf["payload"]]
                yield _pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "kind": pdf["kind"],
                        "phash": _pd.Series(ph, dtype="int64"),
                    }
                )
                continue
            # hash the HEX encoding of the payload: identical
            # discriminative power for a fake codec (exact payloads
            # collide), and hex keeps the pipeline expressible in the
            # DuckDB oracle (its sha256 only accepts VARCHAR)
            ph = [
                int.from_bytes(
                    _hl.sha256(bytes(p).hex().encode()).digest()[:4],
                    "big",
                )
                for p in pdf["payload"]
            ]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "phash": _pd.Series(ph, dtype="int64"),
                }
            )

    if decode == "real":
        # The pure-numpy real codec decodes BMP images only (audio /
        # video perceptual hashing is a different algorithm family,
        # not a decode gap) — restrict the stage like resize_images
        # does rather than dying mid-batch on a WAV payload.
        media = media.filter(F.col("kind") == "image")
    return media.select("media_id", "kind", "payload").mapInPandas(
        stage, schema="media_id long, kind string, phash long"
    )


_PHASH_HEX_SQL = (
    "sha256("
    + " || ".join(f"md5(c || ':chunk{i}')" for i in range(4))
    + ")"
)

@register(
    "media_phash_dedup",
    oracle=f"""
        WITH content AS (
            SELECT doc_id AS media_id,
                   CASE WHEN doc_id <= 1 THEN '__pinned_dup_payload__'
                        ELSE text END AS c
            FROM documents
        ),
        hashes AS (
            SELECT media_id,
                   CAST(('0x' || substr({{phash_hex}}, 1, 8)) AS BIGINT)
                       AS phash
            FROM content
        ),
        bands AS (
            SELECT media_id, phash, b.band,
                   (phash >> (8 * b.band)) & 255 AS band_val
            FROM hashes,
                 (SELECT unnest(generate_series(0, {PHASH_BANDS - 1}))
                      AS band) b
        ),
        cand AS (
            SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
                   a.phash AS pa, b.phash AS pb
            FROM bands a
            JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
                 AND a.media_id < b.media_id
        )
        SELECT id_a, id_b,
               CAST(bit_count(xor(pa, pb)) AS INTEGER) AS hamming
        FROM cand
        WHERE bit_count(xor(pa, pb)) <= {PHASH_HAMMING_MAX}
        ORDER BY id_a, id_b
    """.replace("{phash_hex}", _PHASH_HEX_SQL),
    doc="Perceptual-hash media near-duplicate pairs — the MEDIA twin "
    "of text SimHash (#32), same banded-LSH shape: Arrow mapInPandas "
    f"computes a {PHASH_BITS}-bit pHash per payload (fake codec "
    "hashes bytes; a real one downsamples pixels, so visually-similar "
    "media collide), then candidate pairs share one of "
    f"{PHASH_BANDS} 8-bit bands (pigeonhole-lossless for Hamming <= "
    f"{PHASH_HAMMING_MAX}) and verify by XOR popcount. The payload "
    "is projected away BEFORE the join — only 8-byte hashes shuffle, "
    "never megabyte payloads, which is the whole point of the design "
    "at 100 TB of media. Candidate volume is band-bucket-bounded "
    "exactly like the text LSH family. Round 7: FULL hash gate — the "
    "fake codec hashes the payload's hex encoding, which the DuckDB "
    "oracle recomputes end-to-end (payload synthesis -> pHash -> "
    "banding -> Hamming verify), so the Arrow stage, the band join, "
    "and the planted (0,1) duplicate are all value-checked.",
    tags=("multimodal", "dedup"),
)
def media_phash_dedup(spark, sf_dir: str) -> DataFrame:
    return phash_pairs(media_phash(synth_media(spark, sf_dir)))


def phash_pairs(hashes: DataFrame) -> DataFrame:
    """Banded near-dup pairs from a (media_id, phash) table — the
    join stage of `media_phash_dedup`, separated so the pigeonhole
    banding + Hamming verification is testable on crafted hashes
    (sha256 fakes can't produce <=3-bit neighbors on demand)."""
    bands = hashes.select(
        "media_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    (
                        F.shiftright(F.col("phash"), 8 * i)
                        % F.lit(256)
                    ).cast("int")
                    for i in range(PHASH_BANDS)
                ]
            )
        ).alias("band", "band_val"),
    )
    a = bands.select(
        F.col("media_id").alias("id_a"),
        F.col("phash").alias("ph_a"),
        "band",
        "band_val",
    )
    b = bands.select(
        F.col("media_id").alias("id_b"),
        F.col("phash").alias("ph_b"),
        "band",
        "band_val",
    )
    cand = (
        a.join(b, ["band", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ph_a", "ph_b")
        .distinct()
    )
    hamming = F.bit_count(
        F.col("ph_a").bitwiseXOR(F.col("ph_b"))
    ).cast("int")
    return (
        cand.select("id_a", "id_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= PHASH_HAMMING_MAX)
        .orderBy("id_a", "id_b")
    )
