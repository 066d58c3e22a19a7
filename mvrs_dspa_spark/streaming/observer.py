"""Progress / metrics observation (SURVEY §2e #29).

The reference threads a `ProgressMonitorFunction` through each job to
count elements/watermarks per operator
(`functions/ProgressMonitorFunction.scala`). Spark already emits the
equivalent per-micro-batch telemetry; this module packages the two
idiomatic hooks:

- :class:`ProgressMonitor` — a `StreamingQueryListener` that records
  every `QueryProgressEvent` (rows/sec, batch durations, state rows,
  observed metrics) without touching the data path;
- :func:`observe_counts` — `df.observe(...)` named accumulator-style
  metrics evaluated inside the running plan (zero extra pass, unlike
  a count() side query) and surfaced in progress events.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


class ProgressMonitor(StreamingQueryListener):
    """Collects per-batch progress for all queries on a session.

    Thread-safe: listener callbacks arrive on Spark's listener bus
    thread while tests read from the main thread.
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.progress: list[dict] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    # StreamingQueryListener interface ------------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        with self._lock:
            self.progress.append(
                {
                    "query_id": str(p.id),
                    "batch_id": p.batchId,
                    "num_input_rows": p.numInputRows,
                    "processed_rows_per_second": p.processedRowsPerSecond,
                    "duration_ms": dict(p.durationMs or {}),
                    "observed_metrics": {
                        name: row.asDict() for name, row in (p.observedMetrics or {}).items()
                    },
                }
            )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing dependent
        pass

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            self.terminated.append(str(event.id))

    # convenience ---------------------------------------------------------
    def total_input_rows(self) -> int:
        with self._lock:
            return sum(p["num_input_rows"] for p in self.progress)

    def observed(self, name: str) -> list[dict]:
        with self._lock:
            return [
                p["observed_metrics"][name]
                for p in self.progress
                if name in p["observed_metrics"]
            ]


def observe_counts(df: DataFrame, name: str = "progress", *extra: Column) -> DataFrame:
    """Attach in-plan row/metric observation (works for batch + streaming)."""
    return df.observe(name, F.count(F.lit(1)).alias("n_rows"), *extra)
