"""Synthetic data generators: the reference's data_chargers as Spark jobs.

Each generator in the reference is a Python loop emitting ≤10 random rows
per 10-30 s cycle (``src/data_chargers/``). Here each is a single
``spark.range(n)`` + column-expression job — the same distributions, but
any n, fully parallel, and seedable for reproducible tests. They double as
the fixture factory for the test suite (SURVEY §7 step 7).

Distribution sources (file:line in the reference):
- products: category from 5-list, per-category name, price U(9.99, 299.99)
  2dp, SKU "SKU-" + 8 alphanumerics (postgres_loader.py:36-63)
- customers: first×last name grid, templated email, random segment,
  external id (postgres_loader.py:65-77)
- sales events: uuid4 id, now() ts, random (product, customer), qty 1-4,
  unit price = base × U(0.9, 1.1) rounded 2dp (kafka_loader.py:46-64)
- inventory: per-(warehouse, date) snapshot rows, stock U(0, 50)
  (minio_loader.py:84-95, 104-122)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

CATEGORIES = ["electronics", "toys", "sports", "books", "home"]
NAME_WORDS = ["nova", "atlas", "pulse", "echo", "orbit", "delta", "prime", "vertex"]
FIRST_NAMES = ["Ana", "Luis", "Marta", "Carlos", "Lucia", "Jorge", "Elena", "Pablo"]
LAST_NAMES = ["Garcia", "Lopez", "Martinez", "Sanchez", "Romero", "Torres"]
SEGMENTS = ["retail", "wholesale", "vip", "online"]


def _pick(options: list[str], seed_col: F.Column) -> F.Column:
    """Deterministic uniform pick from a literal list, keyed by a hash
    column — the codegen-friendly analogue of random.choice."""
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(seed_col, F.lit(len(options))) + 1).cast("int"))


def gen_products(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """G1 random products (postgres_loader.py:44-63)."""
    base = spark.range(1, n + 1).withColumnRenamed("id", "product_id")
    h = F.xxhash64(F.col("product_id"), F.lit(seed))
    return base.select(
        "product_id",
        F.concat(F.lit("SKU-"), F.upper(F.conv(F.abs(h).cast("string"), 10, 36))).alias("sku"),
        F.concat_ws(
            " ", _pick(NAME_WORDS, h), _pick(NAME_WORDS, h + 1), F.col("product_id").cast("string")
        ).alias("product_name"),
        _pick(CATEGORIES, h + 2).alias("category"),
        F.round(F.lit(9.99) + F.pmod(F.abs(h + 3), F.lit(29000)) / 100.0, 2)
        .cast("decimal(12,2)")
        .alias("price"),
        F.lit("EUR").alias("currency"),
        F.current_timestamp().alias("created_at"),
    )


def gen_customers(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """G2 random customers (postgres_loader.py:65-77)."""
    base = spark.range(1, n + 1).withColumnRenamed("id", "customer_id")
    h = F.xxhash64(F.col("customer_id"), F.lit(seed + 1))
    first = _pick(FIRST_NAMES, h)
    last = _pick(LAST_NAMES, h + 1)
    return base.select(
        "customer_id",
        F.concat(F.lit("ext-"), F.lpad(F.col("customer_id").cast("string"), 8, "0")).alias("external_id"),
        F.concat_ws(" ", first, last).alias("name"),
        F.lower(F.concat(first, F.lit("."), last, F.lit("@example.com"))).alias("email"),
        _pick(SEGMENTS, h + 2).alias("segment"),
        F.current_timestamp().alias("created_at"),
    )


def seed_to_minimum(existing: DataFrame, spark: SparkSession, min_count: int = 25, seed: int = 42) -> DataFrame:
    """G3 seed-to-minimum (postgres_loader.py:79-86): append products until
    at least min_count exist. count() is a deliberate action — the decision
    is control flow, not a transform."""
    have = existing.count()
    if have >= min_count:
        return existing
    extra = gen_products(spark, min_count, seed).filter(F.col("product_id") > have)
    return existing.unionByName(extra)


def gen_sales_events(
    spark: SparkSession,
    n: int,
    products: DataFrame,
    customers: DataFrame,
    seed: int = 42,
) -> DataFrame:
    """G4 random sales events joined against the catalog
    (kafka_loader.py:55-64): the dict-lookup becomes a broadcast join."""
    base = spark.range(n).withColumnRenamed("id", "i")
    h = F.xxhash64(F.col("i"), F.lit(seed + 2))
    n_prod = products.count()
    n_cust = customers.count()
    ev = base.select(
        F.expr("uuid()").alias("event_id"),
        F.current_timestamp().alias("ts"),
        (F.pmod(F.abs(h), F.lit(n_cust)) + 1).alias("customer_id"),
        (F.pmod(F.abs(h + 1), F.lit(n_prod)) + 1).alias("product_id"),
        (F.pmod(F.abs(h + 2), F.lit(4)) + 1).cast("int").alias("qty"),
        (F.lit(0.9) + F.pmod(F.abs(h + 3), F.lit(2000)) / 10000.0).alias("_noise"),
    )
    cat = products.select("product_id", F.col("price").cast("double").alias("_base"))
    return (
        ev.join(F.broadcast(cat), "product_id")
        .withColumn("unit_price", F.round(F.col("_base") * F.col("_noise"), 2).cast("decimal(12,2)"))
        .drop("_base", "_noise")
    )


def gen_inventory_snapshots(
    spark: SparkSession,
    products: DataFrame,
    warehouses: int = 3,
    start: str = "2024-01-01",
    days: int = 28,
    step_days: int = 7,
    seed: int = 42,
) -> DataFrame:
    """G5 per-warehouse snapshot walk (minio_loader.py:94-122):
    warehouses × date-sequence cross join → explode, instead of the
    reference's per-warehouse Python date pointers."""
    wh = spark.range(1, warehouses + 1).select(
        F.concat(F.lit("wh-"), F.lpad(F.col("id").cast("string"), 2, "0")).alias("warehouse_id")
    )
    dates = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.date_add(F.lit(start).cast("date"), days - 1),
                F.expr(f"interval {step_days} days"),
            )
        ).alias("date")
    )
    grid = wh.crossJoin(dates).crossJoin(products.select("product_id"))
    h = F.xxhash64("warehouse_id", "date", "product_id", F.lit(seed + 3))
    return grid.select(
        "date",
        "product_id",
        "warehouse_id",
        F.pmod(F.abs(h), F.lit(51)).cast("int").alias("stock_units"),
    )


def gen_documents_zipf(
    spark: SparkSession,
    n: int,
    vocab: int = 30_000,
    words_per_doc: int = 45,
    dup_fraction: float = 0.10,
    family_size: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Documents-table twin with a ZIPF(1) vocabulary — the scale-ladder
    corpus (tools/bench_scale_ladder.py), exposed as a library generator
    so any probe can build a realistic text corpus at any size.

    - word j of doc id is ``w⌊V^u⌋`` with ``u = pmod(xxhash64(id, j, seed),
      10^6)/10^6``: P(rank k) ≈ 1/(k·lnV), so token frequencies have a
      real head/tail and the distinct-gram space grows sub-linearly
      (Heaps-like) — unlike a uniform draw, whose gram space grows
      linearly and makes candidate-volume measurements unrealistic;
    - the first ``dup_fraction`` of docs form ``family_size``-member
      near-duplicate families (38 shared boilerplate words + 7 unique
      tail words, Jaccard ≈ 0.73), so TRUE near-dup pair output is
      LINEAR in corpus size — benchmarks over this corpus measure
      algorithm cost, never output volume;
    - full documents schema (doc_id, text, lang 60/30/10, source,
      n_chars), so every catalog entry runs unchanged against a
      directory holding this as documents.parquet.

    Deterministic in (n, vocab, words_per_doc, seed): same args, same
    corpus, any cluster size."""
    import math

    log_v = math.log(vocab)

    def zipf_word(seed_col, j: int):
        u = F.pmod(F.xxhash64(seed_col, F.lit(j), F.lit(seed)), F.lit(1_000_000)) / F.lit(
            1_000_000.0
        )
        rank = F.floor(F.exp(u * F.lit(log_v))).cast("long")
        return F.concat(F.lit("w"), rank.cast("string"))

    n_dup = int(n * dup_fraction)
    fam = (F.col("id") / family_size).cast("long")
    boiler = F.concat_ws(" ", *[zipf_word(fam, 1000 + j) for j in range(38)])
    tail = F.concat_ws(" ", *[zipf_word(F.col("id"), 2000 + j) for j in range(7)])
    uniq = F.concat_ws(" ", *[zipf_word(F.col("id"), j) for j in range(words_per_doc)])
    text = F.when(F.col("id") < n_dup, F.concat_ws(" ", boiler, tail)).otherwise(uniq)
    lang = (
        F.when(F.pmod(F.xxhash64("id", F.lit(7), F.lit(seed)), F.lit(10)) < 6, "en")
        .when(F.pmod(F.xxhash64("id", F.lit(7), F.lit(seed)), F.lit(10)) < 9, "de")
        .otherwise("fr")
    )
    source = F.concat(
        F.lit("crawl-"),
        F.pmod(F.xxhash64("id", F.lit(11), F.lit(seed)), F.lit(5)).cast("string"),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        source.alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )
