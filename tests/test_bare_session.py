"""tables.table() must work under a session we did NOT configure.

The correctness driver supplies its own SparkSession (no
nanosAsLong, arbitrary timezone).  Round 1 lost 10 queries to this:
events.parquet stores INT64 TIMESTAMP(NANOS) and the bare read threw
PARQUET_TYPE_ILLEGAL.  table() now sets the required runtime SQLConfs
itself; this test simulates a hostile session by actively clearing
them on a fresh newSession() before every read.
"""

from __future__ import annotations

import pytest

from mvrs_dspa_spark import tables


@pytest.fixture()
def bare_spark(spark):
    """A session whose SQLConf mimics the driver's: wrong tz, no nanos cfg."""
    s = spark.newSession()
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    s.conf.set("spark.sql.session.timeZone", "America/New_York")
    return s


def test_all_tables_read_under_bare_session(bare_spark, sf_small):
    for name in tables.TABLE_NAMES:
        df = tables.table(bare_spark, sf_small, name)
        assert df.limit(1).count() >= 0, name


def test_events_ts_is_timestamp_under_bare_session(bare_spark, sf_small):
    df = tables.table(bare_spark, sf_small, "events")
    assert dict(df.dtypes)["ts"].startswith("timestamp")
    assert df.filter("ts IS NOT NULL").limit(1).count() == 1


def test_table_forces_utc(bare_spark, sf_small):
    tables.table(bare_spark, sf_small, "events")
    assert bare_spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert bare_spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
