"""Streaming multi-step funnel — CEP-style ordered pattern matching
(SURVEY §2e #29u).

The streaming twin of the batch `multi_step_funnel`: detect, per user,
the event-time-ordered pattern signup -> click within H -> purchase
within H of that click, and emit one completion row per user the
moment the pattern closes. This is the Flink-CEP / MATCH_RECOGNIZE
capability family re-expressed on `applyInPandasWithState`:

- New step-relevant rows are BUFFERED in keyed state; only rows at or
  below the current watermark are fed to the state machine, in event-
  time order — so out-of-order arrival within the allowed lateness
  cannot corrupt the match (a signup arriving after a later click is
  still processed first). Rows above the watermark stay buffered.
- The state machine keeps only (t1, t2, t3) step timestamps plus the
  not-yet-finalized buffer; once the pattern completes the key's state
  is dropped — per-key state is O(pending late window), not O(stream).
- Equivalence to the batch definition is proven in
  tests/test_streaming_funnel.py: streamed completions must equal the
  batch funnel's completed users exactly (same t1/t2/t3), with the
  usual end-of-input watermark fence.

Reference parity: the reference has no CEP job, but pattern detection
over keyed event streams is the canonical remaining Flink capability
family; this provides it with the same batch/stream one-definition
discipline as the curation, near-dup, and session operators.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STEP_TYPES = ("signup", "click", "purchase")
STATE_SCHEMA = (
    "t1 long, t2 long, t3 long, buf_ts array<long>, buf_step array<int>"
)
OUT_SCHEMA = "user_id long, t1_us long, t2_us long, t3_us long"


def _funnel_fn(horizon_us: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            t1, t2, t3, buf_ts, buf_step = state.get
            buf = list(zip(buf_ts, buf_step))
        else:
            t1 = t2 = t3 = -1
            buf = []

        # on an event-time timeout the iterator is empty; consume it
        # either way so Arrow batches are released
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts_us = pdf["ts"].astype("int64").to_numpy() // 1_000
            for t, step in zip(ts_us, pdf["step"].to_numpy()):
                # step -1 = event types outside the pattern: they exist
                # only to advance the watermark, never enter the buffer
                if step >= 0:
                    buf.append((int(t), int(step)))

        wm_us = state.getCurrentWatermarkMs() * 1_000
        ready = sorted(r for r in buf if r[0] <= wm_us)
        buf = [r for r in buf if r[0] > wm_us]

        # event-time-ordered state machine over the finalized rows:
        # every previously consumed row was <= an earlier watermark, so
        # `ready` extends the consumed sequence in order
        was_done = t3 >= 0
        for t, step in ready:
            if t3 >= 0:
                break
            if step == 0 and t1 < 0:
                t1 = t
            elif step == 1 and t2 < 0 and 0 <= t1 <= t <= t1 + horizon_us:
                t2 = t
            elif step == 2 and 0 <= t2 <= t <= t2 + horizon_us:
                t3 = t

        if t3 >= 0:
            # completed: keep a buffer-free TOMBSTONE so re-arriving
            # events for this user can never emit a second completion
            state.update((t1, t2, t3, [], []))
            if not was_done:
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "t1_us": [t1],
                        "t2_us": [t2],
                        "t3_us": [t3],
                    }
                )
            return
        if buf or t1 >= 0:
            state.update(
                (
                    t1,
                    t2,
                    t3,
                    [r[0] for r in buf],
                    [r[1] for r in buf],
                )
            )
            if buf:
                # wake when the watermark passes the oldest buffered
                # row — without this, rows landing in the FINAL data
                # batch would never finalize (no-data batches only
                # re-invoke keys with pending timeouts)
                oldest_ms = min(r[0] for r in buf) // 1_000
                state.setTimeoutTimestamp(
                    max(oldest_ms, state.getCurrentWatermarkMs() + 1)
                )
        elif state.exists:
            state.remove()

    return fn


def streaming_funnel(
    events: DataFrame,
    horizon_us: int,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """events(ts timestamp, user_id long, event_type string) ->
    one row per user completing the signup->click->purchase pattern."""
    step_map = {t: i for i, t in enumerate(STEP_TYPES)}
    from pyspark.sql import functions as F

    step = F.lit(-1)
    for name, idx in step_map.items():
        step = F.when(F.col("event_type") == name, F.lit(idx)).otherwise(
            step
        )
    # NO pre-filter on step: Catalyst would push the filter BELOW the
    # EventTimeWatermark node into the scan, so event types outside the
    # pattern would stop advancing the watermark and buffered matches
    # would never finalize. Irrelevant rows ride through the shuffle
    # (tagged -1) and are dropped inside the state function instead.
    relevant = events.withWatermark("ts", watermark_delay).select(
        "ts", "user_id", step.cast("int").alias("step")
    )
    return relevant.groupBy("user_id").applyInPandasWithState(
        _funnel_fn(horizon_us),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
