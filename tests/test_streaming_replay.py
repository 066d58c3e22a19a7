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
