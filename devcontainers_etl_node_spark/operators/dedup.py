"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed for the 100 TB case:
- exact dedup is a hash-groupBy (one shuffle on a 64/256-bit content hash,
  never on the raw text);
- MinHash LSH is the classic shingle → minhash signature → band → bucket
  self-join: the only shuffle is on (band_id, band_hash), candidate pairs
  are verified with exact Jaccard before being reported. No O(n²) stage.
- SimHash buckets near-identical docs by a 64-bit sign fingerprint.

All signature computation is pure Column expressions (codegen'd, map-side,
no Python). No collect(), no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column, Window, functions as F

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per exact text value.

    Shuffles on sha2(text) (fixed 32-byte key) rather than the raw document,
    so shuffle volume is independent of document size. Deterministic winner
    (min id) — unlike dropDuplicates, whose survivor is partition-order
    dependent.
    """
    h = F.sha2(F.col(text_col), 256)
    w = Window.partitionBy(h).orderBy(F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


# ---------------------------------------------------------------------------
# Shingling + MinHash
# ---------------------------------------------------------------------------


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """Distinct k-character shingles of the (whitespace-normalized) text."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    n = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: norm.substr(i, F.lit(k))))


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles (n-grams) of the text."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """num_hashes-wide MinHash signature: per seed, min over shingle hashes.

    xxhash64(seed, shingle) is the seeded hash family — JVM-side, no UDF.
    """
    mins = [
        F.array_min(F.transform(shingles, lambda s: F.xxhash64(F.lit(i), s)))
        for i in range(num_hashes)
    ]
    return F.array(*mins)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two string-array columns."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate candidate pairs above `threshold` exact Jaccard.

    shingle → 64-hash MinHash → `bands` bands of rows=num_hashes/bands →
    bucket join on (band, band_hash) → exact-Jaccard verify. Returns
    (id_a, id_b, jaccard_sim) with id_a < id_b, distinct.

    Scale: the self-join key is the LSH bucket, so only colliding docs meet;
    AQE skew-join splits pathological buckets (e.g. boilerplate-heavy crawl
    shards).
    """
    rows = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("_id"),
        char_shingles(text_col, shingle_k).alias("_sh"),
    ).withColumn("_sig", minhash_signature(F.col("_sh"), num_hashes))

    banded = sig.select(
        "_id",
        "_sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.lit(b), F.slice("_sig", b * rows + 1, rows)).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("_id", "_sh", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))

    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sh").alias("sh_a"),
            F.col("b._sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("jaccard_sim", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    threshold: float = 0.2,
    block_col: str | None = None,
) -> DataFrame:
    """Exact n-gram (word shingle) Jaccard over candidate pairs.

    Pairs are blocked on `block_col` (e.g. lang) to avoid the full cross
    product; at 100 TB use minhash_lsh_pairs for candidate generation and
    this only as the verify stage.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        word_shingles(text_col, ngram).alias("_sh"),
        *( [F.col(block_col).alias("_blk")] if block_col else [F.lit(1).alias("_blk")] ),
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, (F.col("a._blk") == F.col("b._blk")) & (F.col("a._id") < F.col("b._id")))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            jaccard(F.col("a._sh"), F.col("b._sh")).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 63  # stay inside a signed 64-bit long


def simhash(col: Column | str) -> Column:
    """63-bit SimHash over whitespace tokens, pure expressions.

    Per token: xxhash64 → per-bit ±1 votes; fingerprint bit i is the sign
    of the summed vote. Near-identical docs land on nearby fingerprints.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    zero = F.array(*[F.lit(0)] * _SIMHASH_BITS).cast("array<int>")
    votes = F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(_SIMHASH_BITS - 1)),
                lambda i: F.when(F.bit_get(h, i) == 1, F.lit(1)).otherwise(F.lit(-1)),
            ),
            lambda a, v: a + v,
        ),
    )
    # fold votes → integer fingerprint (acc*2 + sign bit, MSB-first)
    return F.aggregate(
        votes,
        F.lit(0).cast("long"),
        lambda acc, v: acc * 2 + F.when(v > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")),
    )


def simhash_buckets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Attach the simhash fingerprint; group/join on it for near-dup blocks."""
    return df.select(F.col(id_col), simhash(text_col).alias("simhash"))
