"""Focused tests for the round-9 ``spread`` utility (operators/util.py):
the conditional narrow-input repartition must fire ONLY on inputs with
fewer partitions than the session target, must never change rows, and
must honor the ``spark.serd.spread.partitions`` dial (0 = disabled) —
the no-op-at-scale contract the 100 TB posture relies on."""

import pytest


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_spread_fires_on_narrow_input(spark):
    from serd_spark.operators.util import spread

    base = spark.range(100).coalesce(1)
    out = spread(base)
    assert out.rdd.getNumPartitions() == \
        spark.sparkContext.defaultParallelism
    assert _rows(out) == _rows(base)


def test_spread_noop_on_wide_input(spark):
    from serd_spark.operators.util import spread

    target = spark.sparkContext.defaultParallelism
    base = spark.range(100).repartition(target + 2)
    out = spread(base)
    # already at/above target: the SAME plan comes back, no reshuffle
    assert out is base


def test_spread_factor_scales_target(spark):
    from serd_spark.operators.util import spread

    base = spark.range(100).coalesce(1)
    out = spread(base, factor=2)
    assert out.rdd.getNumPartitions() == \
        2 * spark.sparkContext.defaultParallelism


def test_spread_conf_pin_and_disable(spark):
    from serd_spark.operators.util import spread

    base = spark.range(100).coalesce(1)
    try:
        spark.conf.set("spark.serd.spread.partitions", "3")
        assert spread(base).rdd.getNumPartitions() == 3
        spark.conf.set("spark.serd.spread.partitions", "0")
        assert spread(base) is base
    finally:
        spark.conf.unset("spark.serd.spread.partitions")


def test_spread_barrier_preserves_rows(spark):
    from serd_spark.operators.util import spread

    base = spark.range(50).coalesce(1)
    out = spread(base, barrier=True)
    assert _rows(out) == _rows(base)
    # barrier only applies when the spread fired: wide inputs pass
    # through untouched (nothing corpus-sized is ever checkpointed)
    wide = spark.range(50).repartition(
        spark.sparkContext.defaultParallelism + 1)
    assert spread(wide, barrier=True) is wide
