"""SparkSession factory with the engine's tuned defaults.

Scale posture: AQE on (runtime re-plan + skew-join splitting), Arrow
on (every pandas UDF crosses the JVM↔Python boundary in columnar
batches), shuffle partitions sized for the local harness but meant to
be overridden to ~2-3× total cores on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "serd_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Coalesce floor: AQE sizes post-shuffle partitions by BYTES,
        # but the token/shingle/similarity stages are CPU-dense over
        # short strings — a 1 MB shuffle can carry minutes of md5/
        # regex/array work, and the default 1m floor collapses those
        # stages to one task.  16k keeps them wide; at cluster scale
        # partitions are far above either floor, so behavior there is
        # unchanged.  Override with SPARK_GRAFT_MIN_PARTITION_SIZE.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "16k"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    return b.getOrCreate()
