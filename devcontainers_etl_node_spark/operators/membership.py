"""Broadcast Bloom-filter membership — the constant-size decontamination
probe.

`contamination_check` broadcasts the benchmark gram set itself; that is
exact but the broadcast grows with the eval suite (a large benchmark
union's distinct grams are gigabytes of strings). A Bloom filter caps the
shipped state at m/8 bytes (128 KiB at the default m=2^20) no matter how
many grams the suite holds, at the price of a bounded false-positive
rate and zero false negatives — exactly the right trade for a
*screening* pass whose hits get a precise recheck (the repo's
`contamination_check` / `contamination_threshold` are that recheck).

Plan shape at 100 TB: build is one aggregation over the dimension-sized
benchmark grams (distinct bit positions collected to the driver — at
most m values, independent of corpus size); probe is MAP-ONLY — gram
bit-positions computed JVM-side (xxhash64 inside array transforms, no
Python per row for hashing), then one Arrow-batched pandas_udf holding
the 128 KiB bitset in its closure checks membership per doc. No shuffle
touches corpus text; the per-doc verdict aggregates locally.

The k hash functions use the seed-spread family
`xxhash64(shiftleft(cast(seed+1 as long), 48) XOR xxhash64(gram))` — the
seed literal is cast to LONG so the shift really lands in the high bits
(a 32-bit int literal would shift mod 32 and spread only 16 bits; the
sibling family in dedup.py:118 predates this fix and keeps the 16-bit
spread for persisted-signature stability — see its docstring). The
seed-CHAINED form is degenerate, see NOTES.md round-4 lesson. Build and
probe share `_positions`, so they agree bit-for-bit.

No counterpart in the reference (its ETL pipeline — src/etl/etl.py,
extractors.py, loaders.py — has no dedup/decontamination stage at all);
this is the SURVEY §7 scale extension. Wired as the catalog entry
``bloom_decontaminate`` (screen → exact recheck, oracled against plain
exact contamination) with a zero-false-negative gate in
tests/test_quality_gates.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_M_BITS = 1 << 20
DEFAULT_K = 4


def _positions(gram: Column, m_bits: int, k: int) -> Column:
    """array<long> of the k Bloom bit positions for one gram (JVM-only)."""
    h = F.xxhash64(gram)
    return F.array(
        *[
            F.pmod(
                F.xxhash64(F.shiftleft(F.lit(i + 1).cast("long"), 48).bitwiseXOR(h)),
                F.lit(m_bits),
            )
            for i in range(k)
        ]
    )


def bloom_build(
    bench: DataFrame,
    gram_col: str = "gram",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> np.ndarray:
    """Aggregate the benchmark grams into an m-bit Bloom bitset.

    The only driver-side materialization is the DISTINCT bit-position set
    — bounded by m (2^20 longs worst case, in practice ~k·|grams|),
    independent of corpus size. Returns a packed uint8 array of
    m_bits/8 bytes ready to ship in a UDF closure (Spark serializes the
    closure once per executor, same cost model as a broadcast variable).
    """
    pos_rows = (
        bench.select(F.explode(_positions(F.col(gram_col), m_bits, k)).alias("pos"))
        .distinct()
        .collect()
    )
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    pos = np.fromiter((r.pos for r in pos_rows), dtype=np.int64, count=len(pos_rows))
    # bitwise_or.AT, not fancy-indexed |=: distinct positions sharing a
    # byte are duplicate indices, and buffered fancy in-place ops keep
    # only one write — which silently drops bits and breaks the
    # zero-false-negative guarantee.
    np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bits


def bloom_probe_docs(
    docs: DataFrame,
    bits: np.ndarray,
    grams_col: Column | str = "grams",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Append `bloom_hit` (bool) per doc: true iff ANY gram has all k bits
    set. Never false for a doc holding a benchmark gram (Bloom property);
    spuriously true with bounded probability (1-e^{-kn/m})^k per gram.

    The whole probe is map-only: positions via JVM array transforms,
    membership via one Arrow pandas_udf whose closure owns the bitset.
    """
    g = F.col(grams_col) if isinstance(grams_col, str) else grams_col
    pos_per_gram = F.transform(g, lambda gram: _positions(gram, m_bits, k))

    @F.pandas_udf("boolean")
    def _any_member(pos_lists):  # pd.Series of list[list[int]]
        out = []
        for doc in pos_lists:
            hit = False
            if doc is not None:
                for gram_pos in doc:
                    if all(bits[p >> 3] & (1 << (p & 7)) for p in gram_pos):
                        hit = True
                        break
            out.append(hit)
        import pandas as pd

        return pd.Series(out)

    return docs.withColumn("bloom_hit", _any_member(pos_per_gram))
