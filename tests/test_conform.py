"""Conform/normalize semantics — mirrors the reference's `_normalize_df`
edge cases (SURVEY §5 fixtures 2-3): alias, coerce-with-default, decimal
HALF_UP, lenient dates, missing-column error, NaN→NULL."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import types as T

from devcontainers_etl_node_spark.transforms import conform

TARGET = T.StructType(
    [
        T.StructField("customer_id", T.LongType(), False),
        T.StructField("customer_name", T.StringType(), True),
        T.StructField("price", T.DecimalType(12, 2), True),
        T.StructField("qty", T.IntegerType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("d", T.DateType(), True),
    ]
)


def test_conform_full(spark):
    df = spark.createDataFrame(
        [
            ("7", "Alice", "12.345", "3", "2024-01-02T03:04:05", "2024-01-02"),
            ("x", "Bob", "0.005", "oops", None, "not-a-date"),
        ],
        ["customer_id", "name", "price", "qty", "ts", "d"],
    )
    out = conform(df, TARGET, aliases={"customer_name": "name"})
    rows = {r.customer_name: r for r in out.collect()}

    a = rows["Alice"]
    assert a.customer_id == 7
    assert a.price == Decimal("12.35")  # HALF_UP at 2dp (loaders.py:109-113)
    assert a.qty == 3
    assert a.d.isoformat() == "2024-01-02"

    b = rows["Bob"]
    assert b.customer_id == 0  # coerce-with-default (loaders.py:135-137)
    assert b.qty == 0
    assert b.price == Decimal("0.01")  # 0.005 rounds half-up, not half-even
    assert b.d is None  # lenient date (extractors.py:110-111)


def test_conform_missing_column_raises(spark):
    df = spark.createDataFrame([(1,)], ["customer_id"])
    with pytest.raises(ValueError, match="missing required columns"):
        conform(df, TARGET)


def test_conform_nan_to_null(spark):
    tgt = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    df = spark.createDataFrame([(1, float("nan")), (2, 1.5)], ["id", "v"])
    rows = {r.id: r.v for r in conform(df, tgt).collect()}
    assert rows[1] is None  # NaN→NULL sweep (loaders.py:148)
    assert rows[2] == 1.5


def test_conform_column_order_matches_target(spark):
    df = spark.createDataFrame(
        [("2024-01-02", "n", "1", "1", "2024-01-02T00:00:00", "5")],
        ["d", "customer_name", "price", "qty", "ts", "customer_id"],
    )
    out = conform(df, TARGET)
    assert out.columns == [f.name for f in TARGET.fields]
