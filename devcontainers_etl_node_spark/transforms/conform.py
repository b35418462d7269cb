"""Schema conformance — the Spark-native `_normalize_df`.

Reimplements the semantics of the reference's sink-side normalizer
(``src/etl/loaders.py:115-149``) as a single declarative cast chain that
Catalyst folds into the scan projection (no Python-per-value loops — the
reference's ``.apply(_to_decimal_2)`` at ``loaders.py:140`` is the hot spot
this removes):

- alias columns (``customer_name ← name``, loaders.py:121-126)
- UTC-normalize timestamps (loaders.py:128-133) — a no-op here because the
  session timezone is pinned UTC and TimestampType stores UTC internally
- string→date (loaders.py:132-133)
- numeric coercion with default 0 (``pd.to_numeric(errors="coerce").fillna
  (0)``, loaders.py:135-137) → ``coalesce(try_cast, lit(0))``
- decimal quantize 2dp HALF_UP (loaders.py:109-113,138-140) → Spark's
  decimal cast (HALF_UP by spec)
- missing required column → ValueError (loaders.py:145-147)
- reorder to the target column order + NaN→NULL (loaders.py:148) —
  Spark NULLs are already NULL; only float NaN needs scrubbing.

At 100 TB this is pure map-side work: no shuffle, stays inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T


def conform(
    df: DataFrame,
    target: T.StructType,
    aliases: dict[str, str] | None = None,
    int_default: int | None = 0,
) -> DataFrame:
    """Cast/coerce ``df`` to ``target``; raise ValueError on missing columns.

    aliases: {target_col: source_col} applied first when the target column is
    absent but the source is present (reference loaders.py:121-126).
    int_default: value substituted when an integral cast fails or the input
    is NULL (reference coerces to 0, loaders.py:135-137); None disables.
    """
    out = df
    for dst, src in (aliases or {}).items():
        if dst not in out.columns and src in out.columns:
            out = out.withColumn(dst, F.col(src))

    missing = [f.name for f in target.fields if f.name not in out.columns]
    if missing:
        raise ValueError(f"missing required columns: {missing}")

    cols = []
    for field in target.fields:
        c = F.col(field.name)
        dt = field.dataType
        if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType)) and int_default is not None:
            # pd.to_numeric(errors="coerce").fillna(0) semantics: unparseable
            # or null → default. try_cast returns NULL instead of raising.
            typ = dt.simpleString()
            expr = F.coalesce(F.col(field.name).try_cast(typ), F.lit(int_default).cast(typ))
        elif isinstance(dt, T.DecimalType):
            # Spark decimal cast rounds HALF_UP — same as the reference's
            # Decimal(...).quantize(ROUND_HALF_UP); NULL propagates.
            expr = c.cast(dt)
        elif isinstance(dt, T.DateType):
            if isinstance(out.schema[field.name].dataType, T.StringType):
                # lenient string→date, errors→NULL (reference extractors.py:110-111)
                expr = F.try_to_timestamp(c).cast("date")
            else:
                expr = c.cast("date")
        elif isinstance(dt, T.TimestampType):
            expr = c.cast("timestamp")
        elif isinstance(dt, T.DoubleType):
            # NaN→NULL sweep (reference loaders.py:148): pandas NaN is the
            # null marker; Spark distinguishes NaN from NULL, so scrub.
            casted = c.cast("double")
            expr = F.when(F.isnan(casted), F.lit(None)).otherwise(casted)
        else:
            expr = c.cast(dt)
        cols.append(expr.alias(field.name))

    return out.select(*cols)
