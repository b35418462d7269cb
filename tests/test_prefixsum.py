"""global_running_sum: distributed prefix sum vs the naive global window,
bit-for-bit, across bucket boundaries / ties in the hash key / degenerate
single-bucket keys.  The operator exists so `token_shard_pack` carries no
corpus-proportional single-partition sort — this parity is what makes the
implementation swappable under an unchanged oracle hash."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from devcontainers_etl_node_spark.operators import prefixsum


def _mk(spark, n=4007, key_bits=32):
    """n rows with a uniform hash order key (collisions included: the key
    is mod-reduced so several rows share it and the tiebreak matters)."""
    space = 2**key_bits
    return spark.range(n).select(
        F.col("id").alias("rid"),
        F.pmod(F.xxhash64("id"), F.lit(space // 3)).alias("h"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1000)) + 1).alias("v"),
    )


def _naive(df):
    w = Window.orderBy("h", "rid").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return {r["rid"]: r["cum"] for r in df.select("rid", F.sum("v").over(w).alias("cum")).collect()}


@pytest.mark.parametrize("n_buckets", [1, 8, 64])
def test_matches_global_window(spark, n_buckets):
    df = _mk(spark)
    got = {
        r["rid"]: r["cum"]
        for r in prefixsum.global_running_sum(
            df, "h", ["rid"], "v", n_buckets=n_buckets
        ).collect()
    }
    assert got == _naive(df)


def test_all_rows_in_one_bucket_degenerate(spark):
    """A constant key collapses every row into bucket 0 — still exact
    (the within-bucket window does all the work; this is the documented
    skew caveat, not a wrong answer)."""
    df = spark.range(100).select(
        F.col("id").alias("rid"), F.lit(5).alias("h"), F.lit(2).alias("v")
    )
    out = prefixsum.global_running_sum(df, "h", ["rid"], "v").collect()
    assert sorted(r["cum"] for r in out) == [2 * (i + 1) for i in range(100)]


def test_rejects_non_power_of_two_buckets(spark):
    df = _mk(spark, n=10)
    with pytest.raises(ValueError):
        prefixsum.global_running_sum(df, "h", ["rid"], "v", n_buckets=48)
    with pytest.raises(ValueError):
        prefixsum.global_running_sum(df, "h", ["rid"], "v", n_buckets=2**40)


def test_plan_has_no_unpartitioned_window(spark):
    from devcontainers_etl_node_spark.plans import unpartitioned_windows

    out = prefixsum.global_running_sum(_mk(spark), "h", ["rid"], "v")
    assert unpartitioned_windows(out) == []
