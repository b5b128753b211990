"""Sessionization over event/transcript streams (batch form).

The gaps-and-islands formulation: a new session starts when the gap to
the previous event (per user/conversation) exceeds ``gap_sec``; the
session id is the running count of session starts.  Batch form is pure
window functions (one shuffle on the partition key); the streaming
form of the same semantics is Structured Streaming's
``session_window`` (streaming/ingest.py holds the streaming analogue
of the windowed aggregations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame, gap_sec: int = 1800,
    key_col: str = "user_id", ts_col: str = "ts",
) -> DataFrame:
    """Per-key sessions: (key, session_id, n_events, start/end epoch,
    duration).  Deterministic: epoch seconds rounded to 6 decimals."""
    # NTZ timestamps cast via TIMESTAMP (session TZ pinned to UTC in
    # session.py, so epoch values match a naive-epoch oracle).
    ep = F.col(ts_col).cast("timestamp").cast("double")
    w = Window.partitionBy(key_col).orderBy(ep)
    gap = ep - F.lag(ep).over(w)
    marked = events.select(
        F.col(key_col).alias("key"),
        ep.alias("ep"),
        F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0)
        .alias("is_start"),
    )
    w2 = Window.partitionBy("key").orderBy("ep") \
        .rowsBetween(Window.unboundedPreceding, 0)
    sessions = marked.withColumn(
        "session_id", F.sum("is_start").over(w2).cast("long"))
    return (
        sessions.groupBy("key", "session_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.min("ep"), 6).alias("start_ep"),
            F.round(F.max("ep"), 6).alias("end_ep"),
            F.round(F.max("ep") - F.min("ep"), 6).alias("duration_sec"),
        )
    )
