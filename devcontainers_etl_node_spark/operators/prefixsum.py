"""Distributed exact prefix sum — the scale-safe form of
``SUM(x) OVER (ORDER BY ...)``.

A global running sum is the canonical one-reducer trap: Spark plans an
empty-PARTITION-BY window as a single-partition sort of the WHOLE input
(the same weak class `operators/rankselect.py` closed for element-at-rank
in round 5).  This module computes the identical result with bounded
per-stage state:

1. every row lands in one of ``n_buckets`` ORDERED coarse buckets by the
   high bits of a uniformly-distributed numeric order key (for the
   training-data uses here the ordering IS a hash — the deterministic
   epoch shuffle — so equal-width bucketing is balanced by construction);
2. one partial-aggregate shuffle computes per-bucket sums: ``n_buckets``
   rows, collected to the driver — bounded by the knob, never by the
   corpus (the same bounded-collect class as the bloom bitset and the
   rankselect histogram row);
3. exclusive bucket offsets are broadcast-joined back and the running
   sum runs WITHIN each bucket only (Window partitioned by bucket).

Cost: two passes over the input plus one bucket-keyed shuffle; at 1000
executors the window sorts ~N/n_buckets rows per task instead of N rows
on one reducer.  Pick ``n_buckets`` at a small multiple of the shuffle
partition count.

Uniformity caveat (mirrors rankselect's): equal-width bucketing
(:func:`global_running_sum`) balances only when the order key is
~uniform — true for hash-derived keys, which is what a deterministic
corpus shuffle needs.  For skewed NATURAL orderings (timestamps,
revenue) use :func:`global_running_sum_ranged`: it replaces the
high-bits shift with quantile range boundaries from Greenwald–Khanna
``approxQuantile`` (one bounded-memory pass, deterministic for a given
dataset — the same pattern rankselect's histogram descent uses), so
per-bucket row counts stay ~N/n_buckets no matter how the key is
distributed.  The one irreducible residual: rows EQUAL on the order key
cannot be split across range buckets, so a single value carrying most
of the corpus degenerates to one bucket's window — same tie caveat as
rankselect, documented, and impossible for the unique keys (order ids,
event times with tiebreaks) this serves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_BUCKET = "__psum_bucket"
_OFFSET = "__psum_offset"


def _offsets_then_window(
    bucketed: DataFrame,
    order_by: list[str],
    value_col: str,
    out_col: str,
) -> DataFrame:
    """Shared tail of both variants: per-bucket sums (<= n_buckets rows,
    a bounded driver collect like the rankselect histogram), exclusive
    offsets broadcast back, running sum WITHIN each bucket only."""
    sums = bucketed.groupBy(_BUCKET).agg(
        F.sum(F.col(value_col).cast("long")).alias("s")
    ).collect()
    # NULL order keys bucket to NULL (both variants arrange this), so the
    # guard rides the collect we already pay for: a NULL key would be
    # silently mis-ordered (Spark windows sort NULLS FIRST, SQL oracles
    # NULLS LAST) — the documented non-null total-order precondition is
    # enforced, not assumed.
    if any(row[_BUCKET] is None for row in sums):
        raise ValueError(
            "order_key contains NULLs: the global prefix sum requires a "
            "non-null total order — filter or coalesce the key first"
        )
    acc = 0
    offsets = []
    for row in sorted(sums, key=lambda r: r[_BUCKET]):
        offsets.append((row[_BUCKET], acc))
        acc += row["s"]
    off = bucketed.sparkSession.createDataFrame(
        offsets, f"{_BUCKET} long, {_OFFSET} long"
    )
    within = (
        Window.partitionBy(_BUCKET)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bucketed.join(F.broadcast(off), _BUCKET)
        .withColumn(
            out_col, F.col(_OFFSET) + F.sum(F.col(value_col).cast("long")).over(within)
        )
        .drop(_BUCKET, _OFFSET)
    )


def global_running_sum(
    df: DataFrame,
    order_key: str,
    tiebreak_cols: list[str],
    value_col: str,
    out_col: str = "cum",
    n_buckets: int = 64,
    key_bits: int = 32,
) -> DataFrame:
    """Inclusive running sum of ``value_col`` over the global ordering
    ``(order_key, *tiebreak_cols)`` without a single-partition window.

    ``order_key`` must be a non-null integral column uniform in
    ``[0, 2**key_bits)`` (e.g. the first 8 hex chars of an md5, as
    ``conv(substr(md5(id),1,8),16,10)``); ``(order_key, *tiebreak_cols)``
    must be a total order (unique).  ``n_buckets`` must be a power of two
    so the bucket is a shift of the key's high bits — no float division.
    """
    if n_buckets & (n_buckets - 1) or n_buckets <= 0:
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    shift = key_bits - n_buckets.bit_length() + 1
    if shift < 0:
        raise ValueError(f"n_buckets {n_buckets} exceeds key space 2**{key_bits}")

    bucketed = df.withColumn(
        _BUCKET, F.shiftrightunsigned(F.col(order_key).cast("long"), shift)
    )
    # Bucket id is a pure function of the data (no sampling), so the
    # recomputation in the second pass lands rows in identical buckets.
    return _offsets_then_window(
        bucketed, [order_key, *tiebreak_cols], value_col, out_col
    )


def global_running_sum_ranged(
    df: DataFrame,
    order_key: str,
    tiebreak_cols: list[str],
    value_col: str,
    out_col: str = "cum",
    n_buckets: int = 64,
    relative_error: float = 0.001,
) -> DataFrame:
    """Skew-safe running sum for NATURAL (non-uniform) numeric orderings
    — timestamps-as-epoch, dates-as-days, revenue.  Same contract as
    :func:`global_running_sum` (``(order_key, *tiebreak_cols)`` a total
    order; integral ``value_col``), but bucket boundaries come from a
    Greenwald–Khanna quantile sketch of ``order_key`` instead of the
    key's high bits, so per-bucket row counts stay ~N/n_buckets for ANY
    key distribution (ties excepted — rows equal on the key share a
    bucket).  The boundaries are computed ONCE on the driver (bounded:
    n_buckets-1 doubles) and embedded as literals, so both passes bucket
    identically even though the sketch itself made a pass over the data.
    Cost: one extra bounded-memory aggregation pass vs the hash variant.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(
        set(df.stat.approxQuantile(order_key, qs, relative_error))
    ) if qs else []
    # bucket = number of boundaries strictly below the key: a chain of
    # n_buckets-1 codegen-friendly comparisons (plan size bounded by the
    # knob, never the data); rows equal to a boundary take the lower
    # bucket so equal keys always share a bucket.
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col(order_key) > F.lit(b), 1).otherwise(0)
    # comparison chains swallow NULL (`NULL > b` -> otherwise-0), which
    # would silently file NULL keys under bucket 0; route them to a NULL
    # bucket instead so _offsets_then_window's guard rejects them (the
    # hash variant gets this for free: shift of a NULL cast stays NULL)
    bucket = F.when(F.col(order_key).isNull(), F.lit(None)).otherwise(bucket)
    bucketed = df.withColumn(_BUCKET, bucket.cast("long"))
    return _offsets_then_window(
        bucketed, [order_key, *tiebreak_cols], value_col, out_col
    )


def token_shard_assign(
    df: DataFrame,
    tokens_per_shard: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic training-shard assignment: shuffle docs into the
    reproducible md5 epoch order, pack that order into fixed-token-budget
    shards by each doc's STARTING token offset (shard k is a contiguous,
    reproducible slice of the token stream).  Tokens = whitespace words;
    empty docs are dropped.  Returns (id_col, n_tokens, start_offset,
    shard_id) — integer-exact, the engine under the `token_shard_pack`
    catalog entry and the CLI ``export`` command."""
    d = df.filter(F.length(F.trim(F.col(text_col))) > 0)
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    t = d.select(
        F.col(id_col),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long").alias("n_tokens"),
        h.alias("__psum_h"),
    )
    cum = global_running_sum(
        t, "__psum_h", [id_col], "n_tokens", out_col="__psum_cum", n_buckets=n_buckets, key_bits=32
    )
    start = F.col("__psum_cum") - F.col("n_tokens")
    # Integer division (SQL DIV), not float `/` + cast: double division
    # loses exactness past ~2**53 cumulative tokens, which a 100 TB token
    # stream exceeds; DIV keeps the long-typed arithmetic bit-exact and
    # matches the DuckDB oracle's `//`.
    return cum.select(
        id_col,
        "n_tokens",
        start.alias("start_offset"),
    ).withColumn("shard_id", F.expr(f"start_offset DIV {int(tokens_per_shard)}"))
