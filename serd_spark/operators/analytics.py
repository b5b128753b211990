"""Time-series / relational analytics operators: RANGE-frame rolling
aggregates and transcript role-transition profiles.

These round out the window-function surface (§2.5): ROWS frames are
covered by sessionization and the prefix sum, rank frames by the
top-k family — this module adds VALUE-RANGE frames (trailing time
windows) and ``lead``-based sequence transitions, each with an exact
DuckDB mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rolling_revenue(
    orders: DataFrame, days: int = 30,
    key_col: str = "o_custkey", ts_col: str = "o_orderdate",
    val_col: str = "o_totalprice", id_col: str = "o_orderkey",
) -> DataFrame:
    """Per-customer trailing ``days``-day revenue at each order — the
    moving-window spend feature (fraud velocity checks, LTV curves).

    A RANGE frame over epoch seconds (``rangeBetween(-days·86400,
    0)``): the frame is defined on the ORDER VALUE, so same-timestamp
    peers are always included together — deterministic under ties,
    unlike a ROWS frame.  One shuffle keyed by customer; frames are
    per-customer small.  Sum rounded to 4 dp (trailing frames hold
    few values, so engine summation-order differences sit far below
    the rounding grain)."""
    ep = F.col(ts_col).cast("timestamp").cast("double")
    w = Window.partitionBy(key_col).orderBy(ep) \
        .rangeBetween(-days * 86400, 0)
    return orders.select(
        F.col(id_col).cast("long").alias("order_id"),
        F.col(key_col).cast("long").alias("cust_id"),
        ep.alias("order_ep"),
        F.round(F.sum(val_col).over(w), 4).alias("trailing_revenue"),
        F.count("*").over(w).cast("long").alias("trailing_orders"),
    )


def hourly_error_rates(
    events: DataFrame, ts_col: str = "ts",
    type_col: str = "event_type", error_type: str = "error",
) -> DataFrame:
    """Tumbling-hour error-rate series: (hour as yyyy-MM-dd HH string,
    n_events, n_errors, error_rate) — the pipeline-health monitor
    (a spiking hour means an extractor or source regressed).  One
    map-side-combined aggregation keyed by the hour bucket; the bucket
    is a string so hashing is engine-portable."""
    hour = F.date_format(
        F.date_trunc("hour", F.col(ts_col).cast("timestamp")),
        "yyyy-MM-dd HH")
    is_err = F.when(F.col(type_col) == error_type, 1).otherwise(0)
    return (
        events.select(hour.alias("hour"), is_err.alias("_e"))
        .groupBy("hour")
        .agg(F.count("*").cast("long").alias("n_events"),
             F.sum("_e").cast("long").alias("n_errors"))
        .withColumn("error_rate",
                    F.round(F.col("n_errors") / F.col("n_events"), 6))
    )


def value_outliers(
    events: DataFrame, z: float = 2.5, type_col: str = "event_type",
    val_col: str = "value", id_col: str = "event_id",
) -> DataFrame:
    """Per-type z-score outliers: events whose value deviates more
    than ``z`` sample standard deviations from their type's mean —
    the telemetry anomaly gate.  The per-type (mean, stddev) table is
    ONE aggregation (type-cardinality rows) broadcast back; the filter
    is a map-side comparison, so the corpus never shuffles.  Output:
    (event_id, event_type, value, zscore)."""
    stats = events.groupBy(F.col(type_col).alias("event_type")).agg(
        F.avg(val_col).alias("_mu"),
        F.stddev_samp(val_col).alias("_sd"))
    zscore = F.round((F.col(val_col) - F.col("_mu")) / F.col("_sd"), 6)
    return (
        events.select(F.col(id_col).cast("long").alias("event_id"),
                      F.col(type_col).alias("event_type"),
                      F.col(val_col).alias("value"))
        .join(F.broadcast(stats), "event_type")
        .withColumn("zscore", zscore)
        .where(F.abs(F.col("zscore")) > z)
        .select("event_id", "event_type",
                F.round("value", 6).alias("value"), "zscore")
    )


def corpus_diff(
    old: DataFrame, new: DataFrame, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Snapshot diff between two corpus versions by content hash:
    (status ∈ added / removed / changed / unchanged, n_docs) — the
    ingest regression gate between crawl drops (a sudden spike in
    `changed` means the extractor drifted; in `removed`, the source
    rotted).

    md5 is computed inside each side's scan projection; the diff is
    ONE full outer join keyed by doc id (both sides hash-partition —
    no broadcast assumption between two corpus-scale snapshots) and a
    map-side-combined count."""
    o = old.select(F.col(id_col).cast("long").alias("doc_id"),
                   F.md5(F.col(text_col)).alias("_ho"))
    n = new.select(F.col(id_col).cast("long").alias("doc_id"),
                   F.md5(F.col(text_col)).alias("_hn"))
    status = (
        F.when(F.col("_ho").isNull(), F.lit("added"))
        .when(F.col("_hn").isNull(), F.lit("removed"))
        .when(F.col("_ho") != F.col("_hn"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        o.join(n, "doc_id", "full")
        .select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def profile_columns(df: DataFrame, cols: list) -> DataFrame:
    """Per-column completeness/cardinality profile: (column, n_rows,
    n_null, n_distinct) — the schema-drift / ingest-quality gate run
    before anything downstream trusts a new snapshot.

    ONE aggregation computes every column's counts in a single pass
    over the table (count + per-column count + exact distinct; swap
    ``approx_count_distinct`` for the HLL sketch at extreme
    cardinalities), then a ``stack`` unpivot reshapes the single
    result row — no per-column scans, no driver loop over data."""
    aggs = [F.count("*").alias("_n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"_nd_{c}"))
    row = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', _n - _nn_{c}, _nd_{c}" for c in cols)
    return row.selectExpr(
        "_n", f"stack({len(cols)}, {stack}) AS (column, n_null,"
              " n_distinct)").select(
        F.col("column"),
        F.col("_n").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"))


def role_transitions(
    turns: DataFrame, key_cols: tuple = ("conv_id",),
    order_col: str = "turn_idx", role_col: str = "role",
) -> DataFrame:
    """Role-transition matrix over multi-turn transcripts:
    (role, next_role, n) counts of adjacent-turn role pairs within a
    conversation — the conversation-shape profile (user→assistant→tool
    loops, tool-spam detection, truncated-dialog screening).

    ``lead`` over a per-conversation window (one shuffle keyed by
    conversation, frames conversation-sized) then a map-side-combined
    count."""
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    nxt = F.lead(role_col).over(w)
    return (
        turns.select(F.col(role_col).alias("role"),
                     nxt.alias("next_role"))
        .where(F.col("next_role").isNotNull())
        .groupBy("role", "next_role")
        .agg(F.count("*").cast("long").alias("n"))
    )


def tool_call_stats(
    turns: DataFrame, tool_col: str = "tool",
    text_col: str = "text", ts_col: str = "ts",
    key_cols: tuple = ("conv_id",), order_col: str = "turn_idx",
    error_prefix: str = "error",
) -> DataFrame:
    """Per-tool usage profile over agent transcripts — the input
    table's ``tool`` column finally gets its own operator: how often
    each tool is called, across how many conversations, how often
    its result turn reports an error, and how long the agent sits
    on the result before the next turn (the tool's latency shadow).
    The north rule's transcripts carry (conv_id, turn_idx, role,
    text, tool, ts); rows with a NULL tool (plain dialogue) are
    ignored.

    Output per tool: n_calls, n_convs, err_ppm (result text starts
    with ``error_prefix``, ppm as BIGINT division — integer-exact
    for exact-equality gates), gap_turns (calls that have a next
    turn in the conversation), gap_sec_total (BIGINT epoch-second
    sum of call→next-turn gaps) — callers wanting a mean divide the
    two, keeping floats out of the operator.

    Scale shape: ONE window pass keyed by conversation (the same
    per-conv shuffle every transcript operator rides — co-located
    input makes it exchange-free), then a map-side-combined
    aggregate over tools; tool cardinality is application-sized, so
    the final exchange is tiny.  No joins, nothing collects."""
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    nxt_ts = F.lead(F.col(ts_col).cast("long")).over(w)
    calls = (
        turns.select(
            *key_cols, F.col(tool_col).alias("tool"),
            F.lower(F.col(text_col)).startswith(error_prefix)
            .alias("_err"),
            (nxt_ts - F.col(ts_col).cast("long")).alias("_gap"))
        .where(F.col("tool").isNotNull())
    )
    return calls.groupBy("tool").agg(
        F.count("*").cast("long").alias("n_calls"),
        F.countDistinct(*key_cols).cast("long").alias("n_convs"),
        F.expr("CAST(sum(CASE WHEN _err THEN 1 ELSE 0 END) "
               "* CAST(1000000 AS BIGINT) div count(*) AS BIGINT)")
        .alias("err_ppm"),
        F.count("_gap").cast("long").alias("gap_turns"),
        F.coalesce(F.sum("_gap"), F.lit(0)).cast("long")
        .alias("gap_sec_total"))
