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
