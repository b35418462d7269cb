"""Declared schemas for every logical table the engine touches.

The reference infers schemas mid-pipeline (``pd.read_sql``/``pd.read_csv``/
``pd.DataFrame(rows)``) and re-conforms at the sink (``src/etl/loaders.py:
115-149``). Here every table has a declared StructType — inference never
happens inside the engine.

Two families:
1. The reference's star schema (ClickHouse DDL at ``src/etl/loaders.py:
   47-104`` mapped to Spark types per SURVEY §1).
2. The driver corpus (TPC-H-ish; TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference star schema (src/etl/loaders.py:47-104 → Spark types)
# UInt32 → LongType (Spark has no unsigned; lossless widening).
# UUID → StringType (Spark has no UUID type).
# DateTime64(6,'UTC') → TimestampType with session tz pinned to UTC.
# LowCardinality(String) → StringType (dictionary encoding is storage-level).
# ---------------------------------------------------------------------------

DIM_PRODUCTS = T.StructType(
    [
        T.StructField("product_id", T.LongType(), False),
        T.StructField("sku", T.StringType(), True),
        T.StructField("product_name", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("price", T.DecimalType(12, 2), True),
        T.StructField("currency", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

DIM_CUSTOMERS = T.StructType(
    [
        T.StructField("customer_id", T.LongType(), False),
        T.StructField("external_id", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("segment", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

FACT_SALES = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("customer_id", T.LongType(), True),
        T.StructField("product_id", T.LongType(), True),
        T.StructField("qty", T.IntegerType(), True),
        T.StructField("unit_price", T.DecimalType(12, 2), True),
        T.StructField("external_id", T.StringType(), True),
        T.StructField("customer_name", T.StringType(), True),
        T.StructField("segment", T.StringType(), True),
        T.StructField("sku", T.StringType(), True),
        T.StructField("product_name", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
    ]
)

FACT_INVENTORY = T.StructType(
    [
        T.StructField("date", T.DateType(), True),
        T.StructField("product_id", T.LongType(), True),
        T.StructField("warehouse_id", T.StringType(), True),
        T.StructField("stock_units", T.IntegerType(), True),
        T.StructField("object", T.StringType(), True),  # S3-key provenance (extractors.py:115)
    ]
)

# Kafka sales-event payload (src/data_chargers/kafka_loader.py:55-64) — the
# schema used by from_json over the topic value.
SALES_EVENT = T.StructType(
    [
        T.StructField("event_id", T.StringType(), True),
        T.StructField("ts", T.StringType(), True),  # ISO-8601 string on the wire
        T.StructField("customer_id", T.LongType(), True),
        T.StructField("product_id", T.LongType(), True),
        T.StructField("qty", T.IntegerType(), True),
        T.StructField("unit_price", T.DoubleType(), True),
    ]
)

# Inventory CSV on S3 (src/data_chargers/minio_loader.py:77-87)
INVENTORY_CSV = T.StructType(
    [
        T.StructField("date", T.StringType(), True),  # leniently parsed later (extractors.py:110-111)
        T.StructField("product_id", T.LongType(), True),
        T.StructField("warehouse_id", T.StringType(), True),
        T.StructField("stock_units", T.IntegerType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Driver corpus (TESTDATA.md) — declared to match the parquet exactly.
# ---------------------------------------------------------------------------

CORPUS_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

CORPUS = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType(), True),
            T.StructField("r_name", T.StringType(), True),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType(), True),
            T.StructField("n_name", T.StringType(), True),
            T.StructField("n_regionkey", T.IntegerType(), True),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType(), True),
            T.StructField("c_name", T.StringType(), True),
            T.StructField("c_nationkey", T.IntegerType(), True),
            T.StructField("c_acctbal", T.DoubleType(), True),
            T.StructField("c_mktsegment", T.StringType(), True),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType(), True),
            T.StructField("s_name", T.StringType(), True),
            T.StructField("s_nationkey", T.IntegerType(), True),
            T.StructField("s_acctbal", T.DoubleType(), True),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType(), True),
            T.StructField("p_name", T.StringType(), True),
            T.StructField("p_brand", T.StringType(), True),
            T.StructField("p_type", T.StringType(), True),
            T.StructField("p_size", T.IntegerType(), True),
            T.StructField("p_retailprice", T.DoubleType(), True),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), True),
            T.StructField("o_custkey", T.LongType(), True),
            T.StructField("o_orderstatus", T.StringType(), True),
            T.StructField("o_totalprice", T.DoubleType(), True),
            T.StructField("o_orderdate", T.TimestampType(), True),
            T.StructField("o_orderpriority", T.StringType(), True),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType(), True),
            T.StructField("l_partkey", T.LongType(), True),
            T.StructField("l_suppkey", T.LongType(), True),
            T.StructField("l_linenumber", T.IntegerType(), True),
            T.StructField("l_quantity", T.DoubleType(), True),
            T.StructField("l_extendedprice", T.DoubleType(), True),
            T.StructField("l_discount", T.DoubleType(), True),
            T.StructField("l_tax", T.DoubleType(), True),
            T.StructField("l_returnflag", T.StringType(), True),
            T.StructField("l_linestatus", T.StringType(), True),
            T.StructField("l_shipdate", T.TimestampType(), True),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),  # JSON string
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            T.StructField("label", T.IntegerType(), True),
        ]
    ),
}
