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


def interval_join(
    events: DataFrame, intervals: DataFrame, key_col: str = "user_id",
    ts_col: str = "ts", start_col: str = "start_ep",
    end_col: str = "end_ep", bucket_sec: int | None = None,
) -> DataFrame:
    """Point-in-interval join: each event row picks up every interval
    of the same key whose [start, end] contains its timestamp — log
    enrichment against sessions/deployments/experiments (the range
    join Spark has no built-in operator for).

    Output: events' columns + the interval columns (inner join; an
    event outside every interval drops).

    Scale shape: default is an equi join on the KEY with the range
    conjunct in the join condition — one hash-partitioned shuffle,
    correct whenever per-key interval counts are bounded (sessions,
    deploy windows).  ``bucket_sec`` switches to the time-bucketed
    form for keys with HUGE interval sets: intervals explode into the
    coarse epoch buckets they cover, events compute one bucket, and
    the join keys on (key, bucket) — fan-out = span/bucket_sec per
    interval, never per-key-cartesian; the exact range filter then
    keeps true containment (results identical to the plain path,
    test-enforced).  Pick ``bucket_sec`` ≈ typical span so most
    intervals cover 1-2 buckets."""
    ep = F.col(ts_col).cast("timestamp").cast("double")
    e = events.withColumn("_ep", ep)
    iv = intervals.withColumnRenamed(key_col, "_ikey")
    if bucket_sec is None:
        return e.join(
            iv,
            (e[key_col] == F.col("_ikey"))
            & (F.col("_ep") >= F.col(start_col))
            & (F.col("_ep") <= F.col(end_col))) \
            .drop("_ikey", "_ep")
    b = int(bucket_sec)
    iv = iv.withColumn(
        "_ibk",
        F.explode(F.sequence(
            F.floor(F.col(start_col) / b).cast("long"),
            F.floor(F.col(end_col) / b).cast("long"))))
    eb = e.withColumn("_ebk", F.floor(F.col("_ep") / b).cast("long"))
    return (
        eb.join(iv, (eb[key_col] == F.col("_ikey"))
                & (F.col("_ebk") == F.col("_ibk")))
        .where((F.col("_ep") >= F.col(start_col))
               & (F.col("_ep") <= F.col(end_col)))
        .drop("_ikey", "_ibk", "_ebk", "_ep")
    )


def funnel_counts(
    events: DataFrame, steps: list,
    key_col: str = "user_id", ts_col: str = "ts",
    type_col: str = "event_type", max_gap_days: float | None = None,
) -> DataFrame:
    """Ordered funnel conversion: how many users completed step 1,
    then step 2 strictly AFTER their first step-1 event, and so on —
    the product-analytics primitive (and, for transcript corpora, the
    tool-call sequence funnel).  A user converts step k at the
    earliest step-k event after their step-(k-1) conversion time.

    ``max_gap_days`` (default None = unbounded) additionally bounds
    each step-k conversion to within that many days of the user's
    step-(k-1) conversion — the conversion window every real
    attribution setup needs (without it, a purchase years after the
    click still "converts").  The bound is per adjacent step pair,
    not whole-funnel.

    Output: (step, step_name, n_users), one row per step.

    Scale shape: per step ONE filtered map-side-combined min-ts
    aggregation keyed by user plus one join against the previous
    step's (user, ts) table — step tables shrink monotonically, and
    nothing ever shuffles more than the per-user event subset of one
    event type.  Fixed step list → exactly SQL-mirrorable as chained
    CTEs (the gap bound adds one conjunct to each join)."""
    ep = F.col(ts_col).cast("timestamp").cast("double")
    spark = events.sparkSession
    prev = None
    out = None
    for i, step in enumerate(steps, start=1):
        cur = events.where(F.col(type_col) == step).select(
            F.col(key_col).alias("u"), ep.alias("t"))
        if prev is not None:
            cur = cur.join(
                prev.select("u", F.col("t").alias("_pt")), "u") \
                .where(F.col("t") > F.col("_pt"))
            if max_gap_days is not None:
                cur = cur.where(
                    F.col("t") - F.col("_pt")
                    <= F.lit(float(max_gap_days) * 86400.0))
        cur = cur.groupBy("u").agg(F.min("t").alias("t"))
        row = cur.agg(F.count("*").cast("long").alias("n_users")) \
            .select(F.lit(i).cast("long").alias("step"),
                    F.lit(step).alias("step_name"), "n_users")
        out = row if out is None else out.unionByName(row)
        prev = cur
    return out if out is not None else spark.createDataFrame(
        [], "step long, step_name string, n_users long")


def retention_cohorts(
    events: DataFrame, max_days: int = 7,
    key_col: str = "user_id", ts_col: str = "ts",
) -> DataFrame:
    """Classic cohort retention: users grouped by the DAY of their
    first event; for each cohort and day offset 0..max_days, how many
    cohort members were active that day.  Output: (cohort_day as
    yyyy-MM-dd string — string-typed for engine-portable hashing,
    day_offset, n_users).

    Two map-side-combined aggregations (first-day per user, then the
    distinct (user, offset) count) and one join keyed by user."""
    day = F.to_date(F.col(ts_col).cast("timestamp"))
    first = events.groupBy(F.col(key_col).alias("u")) \
        .agg(F.min(day).alias("cohort"))
    active = (
        events.select(F.col(key_col).alias("u"), day.alias("d"))
        .join(first, "u")
        .select("u", "cohort", F.datediff("d", "cohort").alias("off"))
        .where(F.col("off") <= max_days)
        .distinct()
    )
    return (
        active.groupBy("cohort", "off")
        .agg(F.count("*").cast("long").alias("n_users"))
        .select(F.date_format("cohort", "yyyy-MM-dd")
                .alias("cohort_day"),
                F.col("off").cast("long").alias("day_offset"),
                "n_users")
    )


def props_stats(
    events: DataFrame, json_col: str = "props", path: str = "$.k",
    type_col: str = "event_type",
) -> DataFrame:
    """Semi-structured column stats: extract a JSON field from the
    event payload (JVM ``get_json_object`` — no Python, no UDF) and
    profile it per event type.  The pattern every telemetry/transcript
    pipeline needs for tool-call payloads stored as JSON strings.
    Output: (event_type, n, k_min, k_max, k_avg).

    ``try_cast`` (not ``cast``): a single non-numeric payload must
    degrade to a NULL that ``COUNT(k)`` skips — the same
    null-on-failure semantics as the DuckDB oracle's ``TRY_CAST`` —
    not abort the job under ANSI mode."""
    k = F.get_json_object(F.col(json_col), path).try_cast("long")
    return (
        events.select(F.col(type_col).alias("event_type"),
                      k.alias("_k"))
        .groupBy("event_type")
        .agg(F.count("_k").cast("long").alias("n"),
             F.min("_k").alias("k_min"),
             F.max("_k").alias("k_max"),
             F.round(F.avg("_k"), 6).alias("k_avg"))
    )
