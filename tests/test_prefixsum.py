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


def _mk_skewed(spark, n=4007):
    """A severely skewed NATURAL ordering: exponential-ish key (the vast
    majority of mass crammed near 0, a long sparse tail) — the case that
    collapses equal-width high-bit bucketing into one bucket."""
    return spark.range(n).select(
        F.col("id").alias("rid"),
        # ~87% of keys < 1000, tail reaching ~16M: pow-law-ish via id^3
        F.when(F.pmod("id", F.lit(8)) < 7, F.pmod(F.xxhash64("id"), F.lit(1000)))
        .otherwise(F.pow(F.pmod("id", F.lit(256)).cast("double"), F.lit(3.0)).cast("long") + 1000)
        .alias("h"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1000)) + 1).alias("v"),
    )


@pytest.mark.parametrize("n_buckets", [1, 8, 64])
def test_ranged_matches_global_window_on_skewed_key(spark, n_buckets):
    df = _mk_skewed(spark)
    got = {
        r["rid"]: r["cum"]
        for r in prefixsum.global_running_sum_ranged(
            df, "h", ["rid"], "v", n_buckets=n_buckets
        ).collect()
    }
    assert got == _naive(df)


def test_ranged_buckets_stay_bounded_under_skew(spark):
    """The point of the quantile boundaries: on the skewed key the
    equal-width variant piles ~everything into bucket 0, while the
    ranged variant keeps every bucket within a small factor of N/n_b
    (ties excepted — and this key has ties, so allow the tie volume)."""
    from devcontainers_etl_node_spark.operators.prefixsum import _BUCKET

    df = _mk_skewed(spark)
    n = df.count()
    n_b = 16

    # reconstruct the ranged bucketing exactly as the operator does
    qs = [i / n_b for i in range(1, n_b)]
    bounds = sorted(set(df.stat.approxQuantile("h", qs, 0.001)))
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col("h") > F.lit(b), 1).otherwise(0)
    sizes = [
        r["c"]
        for r in df.withColumn(_BUCKET, bucket)
        .groupBy(_BUCKET)
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    # largest tie group is the irreducible floor for range bucketing
    max_tie = df.groupBy("h").count().agg(F.max("count")).collect()[0][0]
    assert max(sizes) <= max(3 * n / n_b, 2 * max_tie), (sizes, max_tie)

    # and the equal-width variant REALLY is degenerate here (the guard
    # that this test is measuring something): high-bit shift puts every
    # row in bucket 0 because the key mass sits far below 2**32
    shift = 32 - n_b.bit_length() + 1
    eq_sizes = [
        r["c"]
        for r in df.withColumn(_BUCKET, F.shiftrightunsigned(F.col("h").cast("long"), shift))
        .groupBy(_BUCKET)
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    assert max(eq_sizes) == n


def test_ranged_constant_key_degenerates_but_stays_exact(spark):
    df = spark.range(100).select(
        F.col("id").alias("rid"), F.lit(5).alias("h"), F.lit(2).alias("v")
    )
    out = prefixsum.global_running_sum_ranged(df, "h", ["rid"], "v").collect()
    assert sorted(r["cum"] for r in out) == [2 * (i + 1) for i in range(100)]


def test_ranged_plan_has_no_unpartitioned_window(spark):
    from devcontainers_etl_node_spark.plans import unpartitioned_windows

    out = prefixsum.global_running_sum_ranged(_mk_skewed(spark), "h", ["rid"], "v")
    assert unpartitioned_windows(out) == []


def test_null_order_key_raises_both_variants(spark):
    """ADVICE r8: a NULL order key must be a loud error, not a silent
    bucket-0 row that diverges from a SQL oracle's NULLS LAST ordering.
    The guard rides the bucket-sum collect (no extra pass)."""
    import pytest

    df = spark.range(50).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") == 7, F.lit(None)).otherwise(F.col("id")).alias("h"),
        F.lit(1).alias("v"),
    )
    with pytest.raises(ValueError, match="non-null total order"):
        prefixsum.global_running_sum_ranged(df, "h", ["rid"], "v").collect()
    with pytest.raises(ValueError, match="non-null total order"):
        prefixsum.global_running_sum(df, "h", ["rid"], "v").collect()
