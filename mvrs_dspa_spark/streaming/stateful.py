"""Custom stateful sliding window via applyInPandasWithState
(SURVEY §2b #15).

Direct analog of the reference's space-optimized window
(`jobs/activeposts/PostStatisticsFunction.scala:20-150`): instead of
storing every event for every overlapping window (size/slide ×
amplification), keep ONE aggregate bucket per slide interval in keyed
state and merge the size/slide most recent buckets when a window
fires. State per key is O(size/slide), independent of event rate —
the property that makes the operator viable at 100 TB.

Spark-first: `applyInPandasWithState` gives Arrow-batched grouped
state with event-time timeouts; buckets live in the state store value,
window results are emitted when the watermark passes window end.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HOUR_MS = 3_600_000

OUTPUT_SCHEMA = (
    "user_id long, window_start timestamp, window_end timestamp, "
    "n_events long, total_value double"
)
# state: parallel arrays of bucket start (epoch ms), event count, value sum
STATE_SCHEMA = "starts array<long>, counts array<long>, sums array<double>"


def _bucket_window_fn(size_ms: int, slide_ms: int):
    n_buckets = size_ms // slide_ms

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        starts: list[int]
        counts: list[int]
        sums: list[float]
        if state.exists:
            starts, counts, sums = map(list, state.get)
        else:
            starts, counts, sums = [], [], []
        buckets = {s: (c, v) for s, c, v in zip(starts, counts, sums)}

        wm_ms = state.getCurrentWatermarkMs()

        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
                vals = pdf["value"].to_numpy()
                for t, v in zip(ts_ms, vals):
                    b = int(t - t % slide_ms)
                    c, s = buckets.get(b, (0, 0.0))
                    buckets[b] = (c + 1, s + float(v))
        else:
            # consume the (empty) iterator so Arrow batches are released
            for _ in pdfs:
                pass

        # fire every window whose end <= watermark: window [ws, ws+size)
        # merges the n_buckets buckets starting at ws.
        out_rows = []
        if buckets and wm_ms > 0:
            lo = min(buckets)
            hi = max(buckets)
            ws = lo - (size_ms - slide_ms)
            while ws + size_ms <= wm_ms and ws <= hi:
                member = [
                    buckets[b]
                    for b in range(ws, ws + size_ms, slide_ms)
                    if b in buckets
                ]
                if member:
                    out_rows.append(
                        {
                            "user_id": key[0],
                            "window_start": pd.Timestamp(ws, unit="ms"),
                            "window_end": pd.Timestamp(ws + size_ms, unit="ms"),
                            "n_events": sum(c for c, _ in member),
                            "total_value": round(sum(s for _, s in member), 2),
                        }
                    )
                ws += slide_ms
            # prune buckets fully covered by fired windows (end <= watermark
            # means no future window can include buckets older than wm-size)
            cutoff = wm_ms - (size_ms - slide_ms)
            buckets = {b: cs for b, cs in buckets.items() if b >= cutoff}

        if buckets:
            items = sorted(buckets.items())
            state.update(
                (
                    [b for b, _ in items],
                    [c for _, (c, _) in items],
                    [s for _, (_, s) in items],
                )
            )
            # wake up when the next unfired window can close
            next_end = min(buckets) + size_ms
            state.setTimeoutTimestamp(max(next_end, wm_ms + 1))
        else:
            state.remove()

        if out_rows:
            yield pd.DataFrame(out_rows)

    return fn


def bucketed_sliding_stats(
    events: DataFrame,
    size_ms: int = 6 * HOUR_MS,
    slide_ms: int = HOUR_MS,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Sliding per-user window stats with O(size/slide) state per key."""
    if size_ms % slide_ms:
        raise ValueError("size must be a multiple of slide")
    return (
        events.select("user_id", "ts", "value")
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _bucket_window_fn(size_ms, slide_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
