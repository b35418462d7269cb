"""exact_rank_select: distributed element-at-rank vs the naive global
window, bit-for-bit, across ties / DESC metrics / groups / degenerate
distributions.  The operator exists so `rfm_segments`,
`time_to_convert` and `quantile_buckets` carry no corpus-proportional
single-partition sort — the parity tests here are what lets those
queries swap implementations with unchanged oracle hashes."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window, functions as F

from devcontainers_etl_node_spark.operators import rankselect as rs


def _mk(spark, n=5003, mod=97):
    """n rows with HEAVY ties (val = hash % mod) and a unique tiebreak."""
    return spark.range(n).select(
        F.col("id").alias("key"),
        F.pmod(F.xxhash64("id"), F.lit(mod)).cast("double").alias("val"),
    )


def _window_rank_rows(df, sort_cols):
    w = Window.orderBy(*sort_cols)
    return df.select(
        *sort_cols, F.row_number().over(w).alias("rn")
    ).collect()


@pytest.mark.parametrize("n_bins", [8, 1024])
def test_quantile_ranks_match_global_window(spark, n_bins):
    df = _mk(spark)
    fracs = [0.25, 0.5, 0.75, 1.0]
    got = {
        r.target_id: (r.val, r.key)
        for r in rs.exact_rank_select(
            df, ["val", "key"], rs.quantile_rank_rule(fracs), n_bins=n_bins
        ).collect()
    }
    ref = _window_rank_rows(df, ["val", "key"])
    n = len(ref)
    for i, p in enumerate(fracs):
        k = max(1, math.ceil(p * n))
        row = next(x for x in ref if x.rn == k)
        assert got[i + 1] == (row.val, row.key)


@pytest.mark.parametrize("k", [3, 4])
def test_ntile_boundaries_reproduce_ntile_exactly(spark, k):
    """Assigning buckets by struct-compare against the selected boundary
    elements must equal F.ntile for every row — the rfm_segments
    contract."""
    df = _mk(spark, n=2001, mod=13)  # ties everywhere, n % k != 0
    bnd = rs.exact_rank_select(df, ["val", "key"], rs.ntile_rank_rule(k)).collect()
    bmap = {r.target_id: (r.val, r.key) for r in bnd}
    assert len(bmap) == k - 1
    key = F.struct(F.col("val"), F.col("key"))
    q = F.lit(1)
    for i in range(1, k):
        bv, bk = bmap[i]
        q = q + (key > F.struct(F.lit(bv).cast("double"), F.lit(bk).cast("long"))).cast(
            "int"
        )
    mine = {r.key: r.q for r in df.select("key", q.alias("q")).collect()}
    ref = {
        r.key: r.nt
        for r in df.select(
            "key", F.ntile(k).over(Window.orderBy("val", "key")).alias("nt")
        ).collect()
    }
    assert mine == ref


def test_grouped_selection_matches_per_group_window(spark):
    df = spark.range(4000).select(
        F.col("id").alias("key"),
        F.pmod(F.col("id"), F.lit(3)).alias("g"),
        F.pmod(F.xxhash64("id"), F.lit(41)).cast("double").alias("val"),
    )
    got = {
        (r.g, r.target_id): (r.val, r.key)
        for r in rs.exact_rank_select_by(
            df, ["g"], ["val", "key"], rs.quantile_rank_rule([0.5]), n_bins=16
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("val", "key")
    wn = Window.partitionBy("g")
    ref = df.select(
        "g", "val", "key",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    ).collect()
    for g in (0, 1, 2):
        rows = [x for x in ref if x.g == g]
        k = max(1, math.ceil(0.5 * rows[0].n))
        row = next(x for x in rows if x.rn == k)
        assert got[(g, 1)] == (row.val, row.key)


def test_desc_metric_via_negation(spark):
    df = _mk(spark, n=999, mod=7)
    neg = df.withColumn("nval", -F.col("val"))
    got = {
        r.target_id: (r.val, r.key)
        for r in rs.exact_rank_select(
            neg, ["nval", "key"], rs.quantile_rank_rule([0.5])
        ).collect()
    }
    w = Window.orderBy(F.col("val").desc(), F.col("key"))
    ref = df.select("val", "key", F.row_number().over(w).alias("rn")).collect()
    k = max(1, math.ceil(0.5 * len(ref)))
    row = next(x for x in ref if x.rn == k)
    assert got[1] == (row.val, row.key)


def test_constant_value_degenerate_single_bin(spark):
    """All rows share one value → one bin holds everything (the
    documented degenerate case): still exact, order decided by the
    tiebreak alone."""
    df = spark.range(100).select(
        F.col("id").alias("key"), F.lit(5.0).alias("val")
    )
    got = rs.exact_rank_select(
        df, ["val", "key"], rs.quantile_rank_rule([0.5])
    ).collect()
    assert len(got) == 1 and got[0].key == 49  # rank 50 of keys 0..99


def test_empty_input_and_out_of_range_ranks(spark):
    empty = spark.range(0).select(
        F.col("id").alias("key"), F.col("id").cast("double").alias("val")
    )
    assert (
        rs.exact_rank_select(empty, ["val", "key"], rs.quantile_rank_rule([0.5])).count()
        == 0
    )
    df = _mk(spark, n=10, mod=5)

    def beyond(n):
        return F.array(
            F.struct(
                F.lit(1).alias("target_id"), (n + 5).cast("long").alias("target_rank")
            )
        )

    assert rs.exact_rank_select(df, ["val", "key"], beyond).count() == 0


def test_tiny_n_ntile_all_k(spark):
    """n < k: ntile leaves later buckets empty — boundary ranks repeat
    and assignment must still match F.ntile row-for-row."""
    for n in (1, 2, 3, 5):
        df = spark.range(n).select(
            F.col("id").alias("key"), F.col("id").cast("double").alias("val")
        )
        bnd = rs.exact_rank_select(df, ["val", "key"], rs.ntile_rank_rule(4)).collect()
        bmap = {r.target_id: (r.val, r.key) for r in bnd}
        key = F.struct(F.col("val"), F.col("key"))
        q = F.lit(1)
        for i in (1, 2, 3):
            if i in bmap:
                bv, bk = bmap[i]
                q = q + (
                    key > F.struct(F.lit(bv).cast("double"), F.lit(bk).cast("long"))
                ).cast("int")
        mine = {r.key: r.q for r in df.select("key", q.alias("q")).collect()}
        ref = {
            r.key: r.nt
            for r in df.select(
                "key", F.ntile(4).over(Window.orderBy("val", "key")).alias("nt")
            ).collect()
        }
        assert mine == ref, n


def test_recursive_guard_bounds_candidate_bin_on_99pct_constant(spark):
    """The degenerate-distribution guard: 99% of rows share one value, so
    the one-shot plan's candidate bin would be ~99% of N. The recursive
    variant must (a) detect the oversized bin from its own histogram,
    (b) recurse — advancing to the numeric tiebreak when the value is
    constant within the bin — and (c) finish with every ranked slice
    bounded by max_bin_rows, while still selecting exactly the rows the
    naive global sort selects."""
    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("key"),
        # 99% zeros, 1% spread over 1..100
        F.when(F.pmod(F.col("id"), F.lit(100)) == 0, F.pmod(F.xxhash64("id"), F.lit(100)) + 1)
        .otherwise(F.lit(0))
        .cast("double")
        .alias("val"),
    )
    fracs = [0.25, 0.5, 0.9]
    stats: list = []
    got = {
        r.target_id: (r.val, r.key)
        for r in rs.exact_rank_select_recursive(
            df,
            [],
            ["val", "key"],
            rs.quantile_rank_rule(fracs),
            n_bins=64,
            max_bin_rows=2_000,
            stats=stats,
        ).collect()
    }
    ref = _window_rank_rows(df, ["val", "key"])
    for i, p in enumerate(fracs):
        k = max(1, math.ceil(p * len(ref)))
        row = next(x for x in ref if x.rn == k)
        assert got[i + 1] == (row.val, row.key)

    # the guard observed the oversized bin and recursed past it: at least
    # one target descended (depth >= 1) and every FINAL ranked slice —
    # the last stats entry per target — is within the bound
    assert any(s["depth"] >= 1 for s in stats)
    last_per_target = {}
    for s in stats:
        last_per_target[s["target_id"]] = s
    for s in last_per_target.values():
        assert s["bin_rows"] <= 2_000, s
    # the constant-value targets recursed on the TIEBREAK column
    assert any(s["col"] == "key" for s in stats)


def test_recursive_matches_oneshot_on_benign_distribution(spark):
    """On a well-spread distribution the recursive variant selects the
    identical rows as the one-shot lazy plan (and never recurses)."""
    df = _mk(spark, n=3001, mod=997)
    fracs = [0.5, 1.0]
    stats: list = []
    a = {
        r.target_id: (r.val, r.key)
        for r in rs.exact_rank_select_recursive(
            df, [], ["val", "key"], rs.quantile_rank_rule(fracs), max_bin_rows=1_000, stats=stats
        ).collect()
    }
    b = {
        r.target_id: (r.val, r.key)
        for r in rs.exact_rank_select(
            df, ["val", "key"], rs.quantile_rank_rule(fracs)
        ).collect()
    }
    assert a == b
    assert all(s["depth"] == 0 for s in stats)


def test_recursive_grouped_matches_per_group_window(spark):
    """Grouped recursion: per-group medians on a skewed-within-group
    column equal the per-group window answer."""
    df = spark.range(4000).select(
        (F.col("id") % 4).alias("g"),
        F.col("id").alias("key"),
        F.when(F.col("id") % 10 < 9, F.lit(0.0)).otherwise((F.col("id") % 50).cast("double")).alias("val"),
    )
    got = {
        (r.g, r.target_id): (r.val, r.key)
        for r in rs.exact_rank_select_recursive(
            df, ["g"], ["val", "key"], rs.quantile_rank_rule([0.5]), n_bins=16, max_bin_rows=200
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("val", "key")
    ref = df.select("g", "val", "key", F.row_number().over(w).alias("rn")).collect()
    sizes = {}
    for r in ref:
        sizes[r.g] = max(sizes.get(r.g, 0), r.rn)
    for g, n in sizes.items():
        k = max(1, math.ceil(0.5 * n))
        row = next(x for x in ref if x.g == g and x.rn == k)
        assert got[(g, 1)] == (row.val, row.key)
