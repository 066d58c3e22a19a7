"""Scaled replay schedule — determinism, scaling, bounded out-of-order
(mirrors reference EventSchedulerTestSuite)."""

from __future__ import annotations

from mvrs_dspa_spark.streaming.replay import (
    read_replay_stream,
    replay_schedule,
    write_replay_batches,
)
from mvrs_dspa_spark.tables import table


def test_schedule_scaling_no_delay(spark, sf_small):
    ev = table(spark, sf_small, "events").limit(200)
    sched = replay_schedule(ev, speedup=1000.0, max_delay_ms=0)
    rows = sched.select("ts", "emit_offset_ms", "delay_ms").collect()
    t0 = min(r.ts for r in rows)
    for r in rows:
        assert r.delay_ms == 0
        expect = int((r.ts - t0).total_seconds() * 1000 / 1000.0)
        assert abs(r.emit_offset_ms - expect) <= 1


def test_schedule_deterministic(spark, sf_small):
    ev = table(spark, sf_small, "events").limit(200)
    a = {
        r.event_id: (r.delay_ms, r.emit_offset_ms)
        for r in replay_schedule(ev, max_delay_ms=60_000).collect()
    }
    b = {
        r.event_id: (r.delay_ms, r.emit_offset_ms)
        for r in replay_schedule(ev, max_delay_ms=60_000).collect()
    }
    assert a == b
    c = {
        r.event_id: r.delay_ms
        for r in replay_schedule(ev, max_delay_ms=60_000, seed=1).collect()
    }
    assert any(c[k] != a[k][0] for k in c)  # different seed, different delays


def test_delay_bounded(spark, sf_small):
    ev = table(spark, sf_small, "events").limit(500)
    rows = replay_schedule(ev, max_delay_ms=5_000).select("delay_ms").collect()
    assert all(0 <= r.delay_ms <= 5_000 for r in rows)
    assert len({r.delay_ms for r in rows}) > 10  # actually spread out


def test_replay_batches_stream_roundtrip(spark, sf_small, tmp_path):
    ev = table(spark, sf_small, "events").limit(300).select("event_id", "ts", "value")
    out = str(tmp_path / "replay")
    paths = write_replay_batches(
        ev, out, n_batches=3, speedup=1000.0, max_delay_ms=120_000
    )
    assert 1 < len(paths) <= 3

    stream = read_replay_stream(spark, out, ev.schema)
    q = (
        stream.writeStream.format("memory")
        .queryName("replayed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) c FROM replayed").first().c
    assert got == 300
    # one micro-batch per schedule slice
    assert q.lastProgress["batchId"] + 1 >= len(paths)


def test_rate_aligned_replay(spark, sf_small, tmp_path):
    """Wall-clock pacing: run the rate-aligned stream for a few
    seconds; events must arrive in schedule order and only those whose
    offset has elapsed may be present (completeness bounded by run
    time, so assert subset + ordering, not totals)."""
    from mvrs_dspa_spark.streaming.replay import replay_rate_aligned, replay_schedule

    ev = table(spark, sf_small, "events").limit(200).select("event_id", "ts")
    # compress the whole 30-day stream into ~4 wall seconds
    span_ms = (
        replay_schedule(ev, speedup=1.0).agg({"emit_offset_ms": "max"}).first()[0]
    )
    speedup = span_ms / 4_000.0
    stream = replay_rate_aligned(spark, ev, speedup=speedup, ticks_per_second=10)
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_replay")
        .outputMode("append")
        .start()
    )
    try:
        import time as _time

        _time.sleep(8)
    finally:
        q.stop()
    got = spark.sql(
        "SELECT event_id, emitted_at FROM rate_replay ORDER BY emitted_at"
    ).collect()
    assert got, "no events released within the run window"
    sched = {
        r.event_id: r.emit_offset_ms
        for r in replay_schedule(ev, speedup=speedup).collect()
    }
    # emission order respects the schedule at tick granularity (events
    # released by the same tick share emitted_at, so their relative
    # order is arbitrary; ticks themselves must be non-decreasing)
    ticks = [sched[r.event_id] * 10 // 1000 for r in got]
    assert all(a <= b for a, b in zip(ticks, ticks[1:]))
