"""Skew mitigation for joins past what AQE handles.

AQE's skew-join splitting (on in ``session.py``) is the first line of
defense — it splits oversized *partitions* at runtime.  What it cannot
fix is a single join KEY too hot for one task (every row of the key
hashes to one partition no matter how it's split between equal keys).
``salted_join`` handles that case explicitly: the skewed side's rows
fan out over ``n_salts`` sub-keys and the other side replicates once
per salt — turning one impossible task into ``n_salts`` bounded ones
at the cost of replicating the (smaller) build side ``n_salts``×.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
    salt_from: Column | None = None,
) -> DataFrame:
    """Equi-join where ``skewed`` has one-key hot spots: rows of the
    skewed side get a deterministic salt in ``[0, n_salts)``; the
    other side is replicated once per salt value; the join key becomes
    (key, salt).  Output columns = skewed's ∪ other's (salt dropped).

    ``salt_from`` sets what the salt is derived from; default is an
    xxhash64 over ALL of the skewed side's columns, which is
    deterministic under retries/replays (never ``rand()`` or
    ``monotonically_increasing_id`` — both break exactly-once).
    Identical duplicate rows share a salt (harmless: distribution is
    what matters, not uniqueness).

    ``how`` is restricted to the variants that are semantics-preserving
    under build-side replication: inner / left / left_semi / left_anti.
    Right/full outer joins would emit each unmatched ``other`` row once
    PER SALT (n_salts duplicates) — raise instead of silently
    duplicating output.
    """
    allowed = {"inner", "left", "leftouter", "leftsemi", "semi",
               "leftanti", "anti"}
    if how.lower().replace("_", "") not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} not supported — the replicated "
            "build side duplicates unmatched other-rows under "
            "right/full outer joins; use inner/left/left_semi/left_anti")
    if salt_from is None:
        salt_from = F.xxhash64(*[F.col(c) for c in skewed.columns])
    s = skewed.withColumn(
        "_salt", F.pmod(salt_from, F.lit(n_salts)).cast("int"))
    r = other.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = s.join(r, [on, "_salt"], how)
    return out.drop("_salt")
