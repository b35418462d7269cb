"""Driver-contract conformance: every query runs; a fast representative
subset is checked against the DuckDB oracle exactly the way the driver does
(row count + sorted-by-name schema + order-insensitive value hash) at
sf0.001. The full sweep lives in tools/verify_oracle.py."""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_SMALL


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


FAST_ORACLED = [
    "pricing_summary",
    "star_enrich",
    "conform_normalize",
    "union_by_name",
    "sort_limit",
    "topk_per_group",
    "sessionize",
    "rollup_sales",
    "semi_join",
    "anti_join",
    "set_intersect",
    "json_extract",
    "dedup_exact",
    "ngram_jaccard",
    "token_stats",
    "knn_cosine",
    "binary_plumbing",
    "median_mode",
    "map_higher_order",
    "stack_inline",
    "customer_distribution",
    "top_supplier",
    "promo_revenue",
    "local_supplier_volume",
    "disjunctive_predicates",
    "inactive_customers",
    "doc_chunking",
    "tfidf_keywords",
    "url_functions",
    "gapfill_locf",
    "profile_columns",
    "histogram_bins",
    "domain_mix",
    "forecast_revenue",
    "late_priority_lines",
    "funnel_conversion",
    "cohort_retention",
    "group_quantiles",
    "pii_redaction",
    "skyline_frontier",
    "copurchase_pairs",
    "editdist_verify",
    "embedding_quantize",
    "scd2_history",
    "mom_growth",
    "attribution_last_touch",
    "event_transitions",
    "rfm_segments",
    "rolling_active_users",
    "reservoir_sample_groups",
    "weighted_priority_sample",
    "benford_digits",
    "calendar_dim",
    "important_part_value",
    "parts_supplier_counts",
    "dominant_suppliers",
    "iqr_outliers",
    "quantile_buckets",
    "copurchase_triangles",
    "bm25_retrieval",
    "setsim_selfjoin",
    "temperature_domain_sample",
    "url_canonical_dedup",
    "peak_concurrency",
    "ccnet_perplexity_buckets",
    "asof_tolerance_join",
]


@pytest.mark.parametrize("name", FAST_ORACLED)
def test_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as entrymod

    sdf = entrymod.queries()[name](spark, SF_SMALL)
    srows, scols = sdf.collect(), sdf.columns
    res = duck.execute(entrymod.oracle_sql()[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _canon(srows, scols) == _canon(orows, ocols)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "nation_name" in df.columns


def test_every_query_has_callable_and_oracle_consistency():
    import __spark_entry__ as entrymod

    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert len(q) >= 40
    assert set(o) <= set(q)
    # rows-only ops are the documented approximate/non-SQL set
    rows_only = set(q) - set(o)
    assert rows_only <= {
        "approx_distinct",
        "lang_id_pred",
        "minhash_neardup",
        "minhash_neardup_blocked",
        "minhash_crossblock_recovered",
        "simhash_fingerprints",
        "ann_lsh",
        "ann_ivf",
        "media_features",
        "percentile_approx",
        "stratified_sample",
        "sequence_pack",
        "dup_pagerank",
        "hll_mergeable",
        "countmin_userid",
        "pretrain_prep",
        "ann_pq",
        "ann_ivfpq",
        "pca_whiten",
        "phonetic_blocking",
        "minhash_incremental",
        "ivf_incremental",
        "entity_clusters",
        "bpe_train",
        "bpe_train_batched",
        "bpe_encode",
        "substr_incremental",
        "quality_classifier",
        "unigram_train",
        "unigram_encode",
        "compression_quality",
    }


def test_all_oracles_type_parity(spark, duck):
    """Declared-type parity for EVERY oracled entry (plan-time only, no
    jobs): the driver's canonicalizer distinguishes int128 from int64 and
    Decimal from float, while the sweep's value hash stringifies — the r8
    `running_revenue_global` red was a DuckDB window SUM(BIGINT) silently
    widening to HUGEINT. This gate kills that class: any oracle column
    whose canonical type class differs from the Spark schema fails here
    before it can rotate into the driver's subset."""
    from tools.type_parity import type_mismatches

    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    offenders = {}
    for name, sql in oracles.items():
        schema = qs[name](spark, SF_SMALL).schema
        rel = duck.sql(sql)
        mism = type_mismatches(schema, rel.columns, rel.types)
        if mism:
            offenders[name] = mism
    assert not offenders, offenders


def test_type_parity_catches_uncast_hugeint_sum(spark, duck):
    """Planted-defect regression: an oracle with an uncast SUM(BIGINT)
    window (DuckDB → HUGEINT) MUST be flagged by the type gate even
    though its stringified values are identical — exactly the r8 failure
    mode. Also pins that the CAST-fixed form passes."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from devcontainers_etl_node_spark.queries.catalog import table
    from tools.type_parity import type_mismatches

    w = Window.orderBy("o_orderkey").rowsBetween(Window.unboundedPreceding, 0)
    sdf = table(spark, SF_SMALL, "orders").select(
        "o_orderkey",
        F.sum(F.col("o_orderkey").cast("long")).over(w).alias("cum"),
    )
    planted = duck.sql(
        "SELECT o_orderkey, SUM(CAST(o_orderkey AS BIGINT)) OVER "
        "(ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "CURRENT ROW) AS cum FROM orders"
    )
    mism = type_mismatches(sdf.schema, planted.columns, planted.types)
    assert mism and "int128" in mism[0], mism

    fixed = duck.sql(
        "SELECT o_orderkey, CAST(SUM(CAST(o_orderkey AS BIGINT)) OVER "
        "(ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "CURRENT ROW) AS BIGINT) AS cum FROM orders"
    )
    assert type_mismatches(sdf.schema, fixed.columns, fixed.types) == []


def test_no_query_outputs_driver_unhashable_columns(spark):
    """The driver's correctness harness canonicalizes result rows via
    pandas sort_values, which cannot hash list/dict cells — an array, map,
    or struct output column crashes the gate (the round-1 media_features
    defect). Lock the invariant: every catalog query's output schema is
    scalar-only. Schema resolution is lazy for most entries, but a few
    eager builders DO execute jobs at DataFrame-construction time
    (minhash_lsh_pairs runs its count()/localCheckpoint, ann_ivf/ann_pq
    fit KMeans), so this sweep runs them at sf0.001 — small enough to
    stay cheap, and the execution doubles as a smoke test."""
    from pyspark.sql import types as T

    import __spark_entry__ as entrymod

    offenders = {}
    for name, fn in entrymod.queries().items():
        schema = fn(spark, "/root/testdata/sf0.001").schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, offenders
