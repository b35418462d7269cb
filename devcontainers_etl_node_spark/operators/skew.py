"""Skew mitigation: explicit key salting.

AQE's skew-join handling (enabled in session.py) splits oversized
partitions at runtime, but it only fires for sort-merge/shuffled-hash
joins and after a stage materializes. Explicit salting is the planned
alternative for known-hot keys (the power-law reality of user_id /
document-domain keys in crawl corpora):

- ``salted_join``: the big side gets a uniform random salt in [0, salt);
  the small side is replicated `salt` times; the join key becomes
  (key, salt), spreading each hot key over `salt` reducers. Semantics are
  identical to the unsalted join for inner/left joins (each big row owns
  exactly one salt value and meets the full small-side key group there).
- ``salted_agg``: two-phase aggregation — partial agg on (key, salt),
  final agg on key — for aggregates whose per-key state is heavy (e.g.
  collect_set); algebraic aggs (sum/count/min/max) already get this from
  Spark's partial aggregation and need no salt.

Both are pure DataFrame compositions — no partitioner surgery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SALT = "_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join `big` ⋈ `small` with the hot-key shuffle spread over
    `salt` reducers per key.

    `how` must be "inner" or "left" (outer semantics on the replicated
    side would duplicate unmatched rows). Output columns = the unsalted
    join's columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    b = big.withColumn(_SALT, (F.rand(seed) * salt).cast("int"))
    s = small.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return b.join(s, keys + [_SALT], how).drop(_SALT)


def salted_agg(
    df: DataFrame,
    key: str | list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation over (key, salt) then key.

    `partial_aggs` run per (key, salt) group; `final_aggs` merge the
    partials per key and must reference the partial output columns.
    """
    keys = [key] if isinstance(key, str) else list(key)
    partial = (
        df.withColumn(_SALT, (F.rand(seed) * salt).cast("int"))
        .groupBy(*keys, _SALT)
        .agg(*partial_aggs)
    )
    return partial.groupBy(*keys).agg(*final_aggs)


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to cluster parallelism — ONLY when the
    input is under-parallel (fewer partitions than cores). Small
    single-file parquet inputs arrive as one split, which serializes any
    CPU-heavy downstream expression (interpreted HOFs, shingling,
    quality scoring) onto one core; at real scale the scan already has
    many splits and this is a no-op, so no corpus-wide shuffle is ever
    added on a cluster."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
