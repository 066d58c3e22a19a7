"""Multimodal (image/audio/video) column plumbing (SURVEY §2f #41).

A 100 TB training-data pipeline carries media as opaque ``binary``
payload columns plus typed metadata, and runs decode / feature
extraction / resizing / frame sampling as Arrow-batched Python stages.
This module provides the Spark-side plumbing — schema, partition-size
control, `mapInPandas` stage shape — with the actual codec calls
stubbed (no image/audio libraries in this container): `decode=`
defaults to a deterministic fake decoder so every downstream stage is
fully testable; passing `decode="real"` raises NotImplementedError at
the stage boundary where PIL/ffmpeg would plug in.

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
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/torchaudio/ffmpeg; "
                    "not available in this environment"
                )
            feats = [_fake_decode_features(p) for p in pdf["payload"]]
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


@register(
    "media_features",
    oracle=None,  # binary payload + sha256 stage; pytest pins the values
    doc="Multimodal feature extraction on the driver-checked surface: "
    "synthesize a binary media table from documents (64-byte "
    "md5-derived payloads, kind image/audio/video), run the Arrow "
    "mapInPandas decode->feature stage (fake codec), project the "
    "payload away. Payloads never touch the driver.",
    tags=("multimodal", "llm", "rows_gate"),
)
def media_features(spark, sf_dir: str) -> DataFrame:
    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    payload = F.concat(
        *[
            F.unhex(F.md5(F.concat(F.col("text"), F.lit(f":chunk{i}"))))
            for i in range(4)
        ]
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"), kind.alias("kind"), payload.alias("payload")
    )

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as _np
        import pandas as _pd

        dim = 16
        for pdf in batches:
            f0 = []
            for p in pdf["payload"]:
                h = hashlib.sha256(bytes(p)).digest()
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
