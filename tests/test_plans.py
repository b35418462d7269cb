"""Physical-plan shape assertions: the 100 TB design properties.

These lock in the plans we want, not just the answers: filters/projections
reach the parquet scan, small dims broadcast (fact never shuffles), global
top-k avoids a global sort, per-group top-k gets the window-group-limit
pushdown, and aggregations are partial (map-side) before the exchange.
A regression in any of these is invisible at sf0.01 and fatal at 100 TB.
"""

from __future__ import annotations

import pytest

from devcontainers_etl_node_spark.queries.catalog import QUERIES
from tests.conftest import SF_SMALL


def plan(spark, name: str, final: bool = False) -> str:
    df = QUERIES[name](spark, SF_SMALL)
    if final:  # AQE: WholeStageCodegen / final join strategy appear only
        df.collect()  # after execution re-plans the stages
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    p = plan(spark, "filter_predicates")
    assert "PushedFilters: [" in p
    # quantity between + returnflag in + shipdate >= all pushable
    assert "GreaterThanOrEqual(l_quantity,10.0)" in p or "l_quantity" in p.split("PushedFilters")[1][:400]


def test_column_pruning_reaches_scan(spark):
    p = plan(spark, "sort_limit")
    read = p.split("ReadSchema:")[1]
    assert "o_orderkey" in read and "o_totalprice" in read
    assert "o_orderpriority" not in read  # untouched column not read


def test_star_enrich_broadcasts_dims_aqe_chosen(spark):
    # Hint discipline: only the constant-row nation dim may carry a hint.
    # customer is sf-proportional (TBs at the 100 TB design point) — a
    # forced build side there OOMs at scale, so the strategy must belong
    # to AQE (BHJ at this sf because the dim fits the threshold, shuffle
    # join at scale) — the same treatment the funnel drop lists got in r4.
    df = QUERIES["star_enrich"](spark, SF_SMALL)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    lines = analyzed.splitlines()
    hint_lines = [i for i, l in enumerate(lines) if "ResolvedHint" in l]
    assert len(hint_lines) == 1  # exactly one hint survives...
    assert "nation" in lines[hint_lines[0] + 1]  # ...and it is the 25-row dim
    p = plan(spark, "star_enrich", final=True)  # AQE's chosen strategy
    final = p.split("== Initial Plan ==")[0]  # executed section only
    assert final.count("BroadcastHashJoin") == 2  # both dims fit → both BHJ
    assert "SortMergeJoin" not in final  # the fact side never shuffles here


def test_global_topk_avoids_full_sort(spark):
    p = plan(spark, "sort_limit")
    assert "TakeOrderedAndProject" in p  # not a global Sort + Limit


def test_group_topk_window_limit_pushdown(spark):
    p = plan(spark, "topk_per_group")
    assert "WindowGroupLimit" in p  # per-partition top-k before shuffle


def test_aggregate_is_partial_before_exchange(spark):
    p = plan(spark, "pricing_summary")
    # two HashAggregates (partial + final) around the exchange
    assert p.count("HashAggregate") >= 2
    final = plan(spark, "pricing_summary", final=True)
    # "*(n)" prefixes mark whole-stage-codegen spans in executedPlan output
    assert "*(1) HashAggregate" in final or "*(2) HashAggregate" in final


def test_semi_join_stays_semi(spark):
    p = plan(spark, "semi_join")
    assert "LeftSemi" in p


@pytest.mark.parametrize("name", ["revenue_by_nation", "above_avg_orders"])
def test_dim_joins_broadcast_aqe_chosen(spark, name):
    # The customer join must NOT be hint-forced (sf-proportional side);
    # at this sf the dim fits the threshold so the FINAL adaptive plan
    # still picks a broadcast strategy — chosen by size, not by hint.
    df = QUERIES[name](spark, SF_SMALL)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    lines = analyzed.splitlines()
    for i in [j for j, l in enumerate(lines) if "ResolvedHint" in l]:
        # any surviving hint covers a bounded side: nation or a 1-row agg
        block = "\n".join(lines[i + 1 : i + 4])
        assert "customer" not in block and "c_custkey" not in block
    p = plan(spark, name, final=True)
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


def test_asof_join_is_linear_window_no_join(spark):
    # round-3 plan: union-and-last-value window — LINEAR per user key.
    # Any join node here means the quadratic clicks x purchases per-user
    # blowup is back (a 10^4 x 10^4 power user = 10^8 intermediate rows).
    p = plan(spark, "asof_join")
    assert "Join" not in p and "CartesianProduct" not in p
    assert "Window" in p
    # exactly one width-changing shuffle: the hashpartitioning on user_id
    assert p.count("Exchange hashpartitioning") == 1


def test_rolling_active_users_no_nested_loop(spark):
    # round-4 re-plan: each activity row explodes into its <= 7 covered
    # grid days and everything downstream is equi-keyed. A nested-loop
    # node here means the |user-days| x |grid| theta join is back — 500x
    # the needed comparisons at 10 years of days.
    p = plan(spark, "rolling_active_users")
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    assert "Generate explode" in p  # the sequence() coverage explode


def test_copurchase_triangles_degree_ordered_no_forced_broadcast(spark):
    # round-5 tightening: NO hint anywhere in the edge build. The keep
    # list is one row per qualifying ORDER — corpus-proportional, the
    # forced-broadcast OOM class — and its semi-join keys on the same
    # l_orderkey the basket self-join shuffles on, so the strategy
    # belongs to AQE at every scale.
    # hint discipline is asserted on the PRE-barrier edge build (the
    # query itself checkpoints the oriented edge list, which hides the
    # upstream plan from its analyzed tree)
    from devcontainers_etl_node_spark.queries.catalog import _copurchase_oriented_edges

    edges = _copurchase_oriented_edges(spark, SF_SMALL)
    analyzed = edges._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    df = QUERIES["copurchase_triangles"](spark, SF_SMALL)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_value_stats_partial_aggregation(spark):
    p = plan(spark, "value_stats")
    assert p.count("HashAggregate") >= 2  # map-side partial before exchange


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """Bucketing both join sides on the key pre-partitions the data at
    write time: the sort-merge join then needs NO Exchange on either side
    — the co-located-join story for repeated large-large joins at 100 TB
    (pay the shuffle once at layout time, never per query)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{tmp_path}/bkt'")
    try:
        from devcontainers_etl_node_spark.sinks import write_bucketed_table

        src = spark.range(10_000).selectExpr("id AS k", "id % 97 AS v")
        for t in ("bkt.left_t", "bkt.right_t"):
            write_bucketed_table(src, t, ["k"], n_buckets=8)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("bkt.left_t").join(spark.table("bkt.right_t"), "k")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # bucket layout replaces the shuffle
            assert j.count() == 10_000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP DATABASE IF EXISTS bkt CASCADE")


def test_plan_inspect_library(spark):
    from devcontainers_etl_node_spark.plans import assert_no_nested_loop, plan_profile

    small = spark.range(10).selectExpr("id AS k")
    big = spark.range(1000).selectExpr("id AS k", "id AS v")
    equi = big.join(small, "k")
    p = plan_profile(equi)
    assert not p["nested_loop"] and p["joins"]
    assert_no_nested_loop(equi)  # no raise

    theta = big.alias("a").crossJoin(small.alias("b"))
    with pytest.raises(AssertionError, match="nested-loop"):
        assert_no_nested_loop(theta, "crossJoin demo")


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling (enabled in session.py) must actually fire:
    a 95%-hot key would pin one reducer at 100 TB; the final adaptive plan
    splits that partition (skew=true on the SMJ) instead."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big = spark.range(200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pay"),
        )
        small = spark.range(10_000).select(F.col("id").alias("k"), F.lit("dim").alias("d"))
        j = big.join(small, "k")
        j.collect()  # executes THIS dataset's queryExecution → final AQE plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan  # the hot partition was split
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_minhash_band_join_skew_split_fires(spark):
    """The band bucket self-join is THE skew point of MinHash dedup: a
    boilerplate-heavy shard collapses thousands of docs into one
    (band, bh) bucket, and that key's quadratic output lands in a single
    reducer. PERF.md claims AQE splits it — this pins the claim on the
    operator's own join: a signature table where 20% of docs share one
    signature must produce SortMergeJoin(skew=true) in the final
    adaptive plan. Thresholds are lowered to make test-scale partitions
    eligible; the broadcast path is disabled because at corpus scale the
    banded table is far beyond any broadcast threshold."""
    from pyspark.sql import functions as F

    from devcontainers_etl_node_spark.operators import dedup

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512b",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        n_hot, n = 2000, 10000
        sig = spark.range(n).select(
            F.col("id").alias("_id"),
            F.when(
                F.col("id") < n_hot,
                F.array(*[F.lit(i).cast("long") for i in range(16)]),
            )
            .otherwise(F.array(*[F.xxhash64(F.col("id"), F.lit(i)) for i in range(16)]))
            .alias("_sig"),
        )
        cand = dedup.band_candidate_pairs(sig, num_hashes=16, bands=4)
        qe = cand._jdf.queryExecution()
        # run THIS queryExecution (collect would ship ~2M pair rows to the
        # driver; executing the physical plan's RDD keeps it executor-side)
        n_pairs = qe.executedPlan().execute().count()
        assert n_pairs == n_hot * (n_hot - 1) // 2  # hot bucket is all-pairs
        plan = qe.executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan  # the hot bucket's partition was split
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Runtime filtering for selective dim joins (the 100 TB lever when
    the dim is too big to broadcast): with runtime bloom filters enabled,
    Catalyst injects might_contain(bloom_filter_agg(dim_keys)) onto the
    fact side of the shuffle join, so fact rows that cannot match are
    dropped at the scan instead of shuffling. Thresholds are lowered here
    because test data is tiny; at production sizes the defaults
    (10 MB creation side / 10 GB application side) gate it."""
    from pyspark.sql import functions as F

    from devcontainers_etl_node_spark.catalog import table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        p = table(spark, SF_SMALL, "part").filter(F.col("p_brand") == "Brand#4").select(
            "p_partkey"
        )
        li = table(spark, SF_SMALL, "lineitem")
        j = li.join(p, li.l_partkey == p.p_partkey).agg(F.count(F.lit(1)).alias("n"))
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in opt and "might_contain" in opt
        # and it computes the same count as without the filter
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
        plain = li.join(p, li.l_partkey == p.p_partkey).agg(F.count(F.lit(1)).alias("n"))
        assert j.collect()[0].n == plain.collect()[0].n
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_lakehouse_layout_partition_prunes(spark, tmp_path):
    """The write_lakehouse_table monthly layout must give partition
    pruning on ym: a filtered read lists only the matching partition
    directories (PartitionFilters in the scan, one ym in the files)."""
    from pyspark.sql import functions as F

    from devcontainers_etl_node_spark.catalog import table as corpus_table
    from devcontainers_etl_node_spark.sinks.files import write_lakehouse_table

    orders = corpus_table(spark, "/root/testdata/sf0.001", "orders")
    path = str(tmp_path / "orders_lake")
    write_lakehouse_table(orders, path, ts_col="o_orderdate", sort_cols=["o_orderkey"])

    df = spark.read.parquet(path).filter(F.col("ym") == "199506")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ym" in plan
    # the pruned read equals a direct read of that one partition directory
    direct = spark.read.parquet(path + "/ym=199506").count()
    assert direct > 0 and df.count() == direct


@pytest.mark.parametrize(
    "name",
    [
        "rfm_segments",
        "time_to_convert",
        "quantile_buckets",
        "token_shard_pack",
        "running_revenue_global",
    ],
)
def test_rank_queries_carry_no_global_single_partition_sort(spark, name):
    """The round-5 perf-weak class: these three used to rank/ntile a
    corpus-proportional table in ONE unpartitioned window (rn == target
    and ntile get no WindowGroupLimit rescue — a single-reducer sort at
    100 TB).  They now go through operators/rankselect.py; pin that no
    Window node in the plan has an empty PARTITION BY, and that the
    within-bin ranking window (partitioned) is still there doing the
    real work."""
    from devcontainers_etl_node_spark.plans import unpartitioned_windows

    df = QUERIES[name](spark, SF_SMALL)
    offenders = unpartitioned_windows(df)
    assert offenders == [], f"{name} still global-sorts: {offenders}"
    assert "Window" in df._jdf.queryExecution().sparkPlan().toString()


def test_unpartitioned_window_detector_fires_on_global_window(spark):
    """The detector itself must flag the pattern it guards against."""
    from pyspark.sql import Window, functions as F

    from devcontainers_etl_node_spark.plans import unpartitioned_windows

    df = spark.range(10).select(
        F.row_number().over(Window.orderBy("id")).alias("rn")
    )
    assert unpartitioned_windows(df) != []


def test_unpartitioned_window_detector_sees_inside_subqueries(spark):
    """A global window hidden inside a scalar subquery plan must not
    escape the walk: subquery plans hang off expressions (visited via
    node.subqueries()), not children(), and are still LOGICAL under
    sparkPlan() — the detector recognizes the un-suffixed node name.
    The partitioned twin stays clean (no false positive)."""
    from devcontainers_etl_node_spark.plans import unpartitioned_windows

    spark.range(100).createOrReplaceTempView("__t_subq")
    hidden = spark.sql(
        "SELECT id, (SELECT max(rn) FROM "
        "(SELECT row_number() OVER (ORDER BY id) rn FROM __t_subq)) AS m "
        "FROM __t_subq"
    )
    assert unpartitioned_windows(hidden) != []
    clean = spark.sql(
        "SELECT id, (SELECT max(rn) FROM "
        "(SELECT row_number() OVER (PARTITION BY id % 2 ORDER BY id) rn "
        "FROM __t_subq)) AS m FROM __t_subq"
    )
    assert unpartitioned_windows(clean) == []


def test_intradoc_dedup_is_map_only_zero_shuffle(spark):
    """intradoc_dedup's whole point is per-row locality: first-occurrence-
    wins inside one document needs no cross-row state, so the physical
    plan must contain NO Exchange at all — it runs at scan speed."""
    p = plan(spark, "intradoc_dedup")
    assert "Exchange" not in p
    assert "*(1)" in p  # scan+tokenize stay codegen'd (HOF projections can't)


def test_bigram_lm_score_partial_agg_and_two_shuffles(spark):
    """The reference-model join must not add shuffles beyond the two the
    design claims (bigram rollup for the model, doc_id rollup for the
    score) plus AQE's broadcast of the Heaps-bounded model side."""
    p = plan(spark, "bigram_lm_score", final=True).split("Initial Plan")[0]
    # both rollups collapse map-side before their exchange
    assert "partial_count" in p
    # exactly the two designed hash shuffles; the ref model side broadcasts
    assert p.count("Exchange hashpartitioning") == 2
    assert "BroadcastHashJoin" in p


def test_tx_changes_pure_append_window_plans_one_scan_no_join(spark, tmp_path):
    """The exact-merge CDF fold must not tax the common case: a feed over
    an append-only window is still ONE parquet scan of the added files —
    no join, no union of per-version subplans (the anti-join machinery
    materializes only when a merge is actually inside the window)."""
    from pyspark.sql import functions as F

    from devcontainers_etl_node_spark.sinks import txlog

    root = str(tmp_path / "t")
    for i in range(4):
        txlog.tx_write(
            spark.range(i * 10, (i + 1) * 10).select(
                F.col("id"), F.lit(f"b{i}").alias("batch")
            ),
            root,
        )
    feed = txlog.tx_changes(spark, root, since_version=1)
    plan = feed._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Union" not in plan
    assert plan.count("Scan parquet") == 1
    assert feed.count() == 20  # v2 + v3 only
