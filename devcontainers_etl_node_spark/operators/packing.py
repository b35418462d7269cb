"""Greedy sequence packing: bin documents into fixed-token training rows.

The last mile of a training-data pipeline: curated documents must be
concatenated into model-context-sized sequences (e.g. 2048 tokens) with
minimal padding. Greedy sequential fill is the standard approach — walk
the documents in a deterministic order, open a new sequence whenever the
next document would overflow the budget.

The fill is inherently stateful-sequential (each assignment depends on
the running remainder), so it cannot be a window expression — but it
only needs to be sequential WITHIN a pack group (e.g. language, or a
hash bucket of bounded size). ``applyInPandas`` gives exactly that
shape: groups are distributed across executors, the per-group fill is a
vectorized cumulative pass over one Arrow batch. At 100 TB the group key
must bound group size (salt a hash bucket into the key if a language is
too hot); packing quality is unaffected because sequences never cross
groups anyway.

No SQL oracle exists (the assignment is a sequential recurrence), so the
driver records the rows-only check; tests/test_operators.py pins the
invariants: budget respected, every doc placed exactly once, determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType


def pack_sequences(
    df: DataFrame,
    token_col: str,
    group_col: str,
    id_col: str,
    max_tokens: int,
) -> DataFrame:
    """Assign each row a (group, seq_id) training-sequence slot.

    Greedy fill in ascending ``id_col`` order within each ``group_col``
    group: a new sequence starts when adding the next document would
    exceed ``max_tokens``. A single document larger than the budget gets
    a sequence of its own (callers should length-filter upstream).
    Deterministic for a fixed input. Returns (id, group, n_tokens,
    seq_id, seq_tokens) — seq_tokens is the filled size of the sequence
    the row landed in.
    """
    out_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("group", df.schema[group_col].dataType),
            StructField("n_tokens", LongType()),
            StructField("seq_id", LongType()),
            StructField("seq_tokens", LongType()),
        ]
    )

    def fill(pdf):
        import pandas as pd

        pdf = pdf.sort_values("id", kind="stable").reset_index(drop=True)
        # a NULL token count arrives as NaN (pandas nullable→float64) and
        # every NaN comparison is False — the budget check would silently
        # pass forever after. Fail loudly instead of packing garbage.
        if pdf["n_tokens"].isna().any():
            bad = pdf.loc[pdf["n_tokens"].isna(), "id"].tolist()[:5]
            raise ValueError(f"pack_sequences: NULL token counts for ids {bad}")
        seq_ids = []
        seq, used = 0, 0
        for t in pdf["n_tokens"]:
            if used > 0 and used + t > max_tokens:
                seq, used = seq + 1, 0
            used += t
            seq_ids.append(seq)
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        pdf["seq_tokens"] = pdf.groupby("seq_id")["n_tokens"].transform("sum")
        return pdf[["id", "group", "n_tokens", "seq_id", "seq_tokens"]]

    prepared = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(group_col).alias("group"),
        F.col(token_col).cast("long").alias("n_tokens"),
    )
    return prepared.groupBy("group").applyInPandas(fill, out_schema)
