"""State-store configuration surface (SURVEY §2e, scale posture).

The default HDFS-backed state store keeps every key in executor heap —
fine for the reference's course-sized streams, fatal for 100 TB keyed
state (per-user windows over hundreds of millions of users). Spark
ships a RocksDB provider (no extra jars) that spills state to local
disk with changelog checkpointing; this module is the one place that
knows the knobs.

Apply before starting queries: provider class is read at query start
from the session conf.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def rocksdb_conf(
    changelog_checkpointing: bool = True,
    bounded_memory_mb: int | None = None,
) -> dict[str, str]:
    """The session conf for RocksDB-backed streaming state.

    changelog checkpointing uploads per-batch deltas instead of full
    snapshots — the difference between O(state) and O(changes) per
    commit at scale.
    """
    conf = {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": str(
            changelog_checkpointing
        ).lower(),
    }
    if bounded_memory_mb is not None:
        conf["spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage"] = "true"
        conf["spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB"] = str(
            bounded_memory_mb
        )
    return conf


def use_rocksdb_state_store(spark: SparkSession, **kwargs) -> None:
    for k, v in rocksdb_conf(**kwargs).items():
        spark.conf.set(k, v)


def use_default_state_store(spark: SparkSession) -> None:
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
