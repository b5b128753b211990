"""Shared operator utilities.

``spread`` fixes the narrow-input parallelism trap (optimization
guide §2.5 "input skew"): the sandbox's per-sf tables are single
parquet files with ONE row group, so every scan starts as ONE task —
and the CPU-dense first stages of the token/shingle operators
(explode + per-shingle md5, per-row regex batteries) then run on one
core regardless of cluster size.  A cheap round-robin repartition of
the small base rows unlocks the cores for the expensive downstream
work.

Scale posture: the repartition is CONDITIONAL on the input having
fewer partitions than the session's parallelism — at 100 TB the scan
already has thousands of splits and ``spread`` is a no-op (no extra
shuffle).  The target is derived from the session
(``defaultParallelism``), never a constant, and can be pinned with
``spark.serd.spread.partitions`` (0 disables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, factor: int = 1,
           barrier: bool = False) -> DataFrame:
    """Round-robin repartition ``df`` to ``factor ×
    defaultParallelism`` partitions IF it currently has fewer —
    otherwise return it unchanged (no shuffle added at scale).

    ``barrier=True`` additionally cuts the plan with a lazy
    ``localCheckpoint`` AFTER the repartition: Catalyst pushes
    deterministic filters through Repartition down to the narrow
    scan, so a consumer that FILTERS on expensive derived columns
    (the fused quality/langid gates) would otherwise evaluate the
    whole expression battery on the one-split side anyway — the
    barrier pins evaluation above the repartition (and evaluates the
    checkpointed projection exactly once).  The barrier only applies
    when the spread actually fired, i.e. on narrow (small) inputs —
    wide inputs pass through untouched, so nothing corpus-sized is
    ever checkpointed."""
    spark = df.sparkSession
    conf_target = int(
        spark.conf.get("spark.serd.spread.partitions", "-1"))
    if conf_target == 0:
        return df
    target = (conf_target if conf_target > 0
              else spark.sparkContext.defaultParallelism * factor)
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    if cur >= target:
        return df
    out = df.repartition(target)
    if barrier:
        out = out.localCheckpoint(eager=False)
    return out
