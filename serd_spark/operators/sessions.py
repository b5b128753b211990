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


def asof_join(
    left: DataFrame, right: DataFrame, by: str = "user_id",
    ts_col: str = "ts", right_cols: tuple = ("event_id", "value"),
    tolerance_sec: float | None = None, suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: every left row picks up the LATEST right
    row with ``right.ts <= left.ts`` in the same ``by`` group (the
    time-series attribution join Spark has no built-in for; DuckDB/
    pandas call it ASOF JOIN / merge_asof).

    Union-tagged single-shuffle formulation — the 100 TB shape:
    tag both inputs, union, one window partitioned by the key and
    ordered by (ts, side) with ``last(..., ignorenulls=True)`` running
    over unbounded-preceding, then keep only left rows.  No range
    cross-product, no per-key loop; right rows sort before left rows
    at equal timestamps so ties match inclusively (``>=``), matching
    DuckDB's ASOF semantics.

    ``tolerance_sec`` nulls out matches older than the window (pandas
    ``merge_asof(tolerance=...)``).  Output: all left columns plus
    ``<right_col><suffix>`` for each requested right column and
    ``<ts_col><suffix>`` (the matched right timestamp).

    Matches are all-or-nothing per right row: the right columns ride
    ONE struct filled with a single ``last(ignorenulls=True)``, so a
    right row carrying NULL in some payload column still matches as a
    whole — never a torn match mixing columns from different right
    rows (which per-column fills would produce, diverging from
    merge_asof/ASOF JOIN semantics).
    """
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    out_rcols = [f"{c}{suffix}" for c in right_cols] + [f"{ts_col}{suffix}"]
    r_struct_type = StructType(
        [StructField(f"{c}{suffix}", right.schema[c].dataType)
         for c in right_cols]
        + [StructField(f"{ts_col}{suffix}", right.schema[ts_col].dataType)])

    l_tag = left.select(
        *lcols,
        F.lit(None).cast(r_struct_type).alias("_r"),
        F.lit(1).alias("_side"),
    )
    r_tag = right.select(
        F.col(by),
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (by, ts_col)],
        F.struct(
            *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
            F.col(ts_col).alias(f"{ts_col}{suffix}"),
        ).alias("_r"),
        F.lit(0).alias("_side"),
    ).select(*lcols, "_r", "_side")

    unioned = l_tag.unionByName(r_tag)
    w = Window.partitionBy(by) \
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc()) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled = unioned.select(
        *lcols, "_side",
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    res = (
        filled.where(F.col("_side") == 1)
        .select(*lcols,
                *[F.col("_r")[c].alias(c) for c in out_rcols])
    )
    if tolerance_sec is not None:
        # NTZ timestamps need the two-step cast to epoch seconds
        age = (F.col(ts_col).cast("timestamp").cast("double")
               - F.col(f"{ts_col}{suffix}").cast("timestamp")
               .cast("double"))
        keep = F.col(f"{ts_col}{suffix}").isNotNull() & \
            (age <= F.lit(float(tolerance_sec)))
        res = res.select(
            *lcols,
            *[F.when(keep, F.col(c)).alias(c) for c in out_rcols],
        )
    return res
