"""Bucketized range (interval) join.

A point-in-interval join written as a plain predicate
(``p >= s AND p < e``) has no equi key, so Spark plans a broadcast
nested-loop / cartesian — O(|L|·|R|) and only viable when one side is
tiny. The scalable formulation buckets the value domain:

- every interval row is replicated to each bucket it overlaps
  (``explode(sequence(floor(s/w), floor((e-ε)/w)))``);
- every point row lands in exactly one bucket (``floor(p/w)``);
- the join key becomes the bucket (hash-partitionable equi key), with the
  exact interval predicate re-checked inside the co-partition.

Each point meets each interval in at most one bucket (the point's own),
so no dedup pass is needed. Replication factor = avg interval width /
bucket width + 1 — pick ``bucket_width`` near the typical interval width
so the factor stays ~2. This is the same decomposition Databricks' range
join hint and KDB band joins use; Spark core has no native equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_BUCKET = "_rj_bucket"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str | Column,
    start_col: str | Column,
    end_col: str | Column,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join every point row to the interval rows with
    ``start <= point < end``, via an equi-join on domain buckets.

    `how` is "inner" or "left" (left keeps pointless points with nulls).
    Column name collisions between the two inputs must be resolved by the
    caller (as with any join).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join supports inner/left, got {how!r}")
    p = F.col(point_col) if isinstance(point_col, str) else point_col
    s = F.col(start_col) if isinstance(start_col, str) else start_col
    e = F.col(end_col) if isinstance(end_col, str) else end_col
    w = float(bucket_width)

    pts = points.withColumn(_BUCKET, F.floor(p / w))
    # half-open [s, e): the last covered bucket is floor((e - ulp)/w); using
    # floor((e)/w) would be wrong only when e is an exact bucket boundary,
    # where the extra bucket contains no matching points — harmless but
    # wasteful; the greatest() guards degenerate/empty intervals.
    ivs = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(s / w).cast("long"),
                F.greatest(F.floor(s / w), F.floor(e / w)).cast("long"),
            )
        ),
    )
    joined = pts.join(ivs, [_BUCKET], how="inner").filter((p >= s) & (p < e))
    if how == "inner":
        return joined.drop(_BUCKET)
    # left: re-attach points that matched nothing
    matched = joined.drop(_BUCKET)
    missing = pts.drop(_BUCKET).join(
        matched.select(*points.columns).distinct(), points.columns, "left_anti"
    )
    return matched.unionByName(missing, allowMissingColumns=True)
