"""Property-based tests (hypothesis): invariants the reference never
checked (SURVEY §5 — the reference has zero tests). Each example runs one
Spark job over a generated batch, so example counts stay small; the
properties, not the volume, carry the weight.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from devcontainers_etl_node_spark.operators import dedup

# sane money range: inside decimal(12,2), away from float-repr edge cases
money = st.floats(
    min_value=-(10**9), max_value=10**9, allow_nan=False, allow_infinity=False
)


@settings(max_examples=5, deadline=None)
@given(st.lists(money, min_size=1, max_size=50))
def test_decimal_cast_matches_python_half_up(spark, xs):
    """F7 conform semantics: Spark's double→decimal(12,2) cast rounds
    HALF_UP exactly like the reference's Decimal(str(x)).quantize
    (loaders.py:109-113) — on the shortest-repr decimal of the double."""
    df = spark.createDataFrame([(i, float(x)) for i, x in enumerate(xs)], ["i", "x"])
    got = {
        r.i: r.d
        for r in df.select("i", F.col("x").cast("decimal(12,2)").alias("d")).collect()
    }
    for i, x in enumerate(xs):
        expected = Decimal(repr(float(x))).quantize(Decimal("0.01"), ROUND_HALF_UP)
        assert got[i] == expected, (x, got[i], expected)


tokens = st.lists(st.sampled_from(list("abcdefgh")), min_size=0, max_size=12)


@settings(max_examples=5, deadline=None)
@given(tokens, tokens)
def test_jaccard_invariants(spark, a, b):
    """jaccard ∈ [0,1], symmetric, 1.0 iff equal non-empty sets, 0.0 for
    disjoint/empty."""
    arr_a = F.array(*[F.lit(t) for t in a])
    arr_b = F.array(*[F.lit(t) for t in b])
    row = (
        spark.range(1)
        .select(
            dedup.jaccard(arr_a, arr_b).alias("ab"),
            dedup.jaccard(arr_b, arr_a).alias("ba"),
        )
        .collect()[0]
    )
    assert row.ab == row.ba
    assert 0.0 <= row.ab <= 1.0
    sa, sb = set(a), set(b)
    if sa or sb:
        expected = len(sa & sb) / len(sa | sb)
        assert abs(row.ab - expected) < 1e-12
    else:
        assert row.ab == 0.0


# small word pool → real shingle collisions across docs; short docs hit the
# n<k degenerate path (single truncated shingle) often
_words = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
    min_size=0,
    max_size=8,
)
_corpus = st.lists(_words, min_size=2, max_size=8)


@settings(max_examples=8, deadline=None)
@given(_corpus)
def test_ngram_jaccard_inverted_matches_bruteforce(spark, docs_words):
    """The inverted-index plan (group count = |A∩B|) and the AllPairs
    prefix-filtered plan must both equal a brute-force Python reference
    (explicit shingle sets, explicit pairwise Jaccard) on arbitrary small
    corpora — including empty docs, single-token docs, and all-identical
    corpora."""
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def shingles(text: str, k: int = 3) -> set[str]:
        toks = text.strip().lower().split()
        if not toks:
            toks = [""]  # F.split of "" yields [""], same as the engine
        if len(toks) <= k:
            return {" ".join(toks[:k])}
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    expected = set()
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1 :]:
            sa, sb = shingles(ta), shingles(tb)
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.2:
                expected.add((ia, ib, round(j, 12)))

    for pf in (False, True):
        got = {
            (r.id_a, r.id_b, round(r.jaccard_sim, 12))
            for r in dedup.ngram_jaccard_pairs(
                df, ngram=3, threshold=0.2, prefix_filter=pf
            ).collect()
        }
        assert got == expected, (pf, got, expected)


_doc_words = st.lists(st.sampled_from([f"w{i}" for i in range(6)]), min_size=1, max_size=45)


@settings(max_examples=6, deadline=None)
@given(st.lists(_doc_words, min_size=1, max_size=4))
def test_intradoc_dedup_matches_python_first_occurrence(spark, docs_words):
    """intradoc_dedup's array-lambda pipeline == the obvious Python model:
    chunk each doc into 10-token units on the fixed grid, keep a unit only
    at its first within-doc occurrence, reassemble. A tiny 6-word alphabet
    plus 45-token docs makes genuine repeats (incl. partial final chunks
    that collide with earlier full chunks) likely."""
    from devcontainers_etl_node_spark.queries.catalog import QUERIES

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        got = {r.doc_id: r for r in QUERIES["intradoc_dedup"](spark, d).collect()}
    for i, ws in enumerate(docs_words):
        units = [" ".join(ws[j : j + 10]) for j in range(0, len(ws), 10)]
        kept, seen = [], set()
        for u in units:
            if u not in seen:
                kept.append(u)
                seen.add(u)
        assert got[i].n_units == len(units)
        assert got[i].kept_units == len(kept)
        assert got[i].new_text == " ".join(kept)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2**32 - 1), st.integers(0, 1000)),
        min_size=1,
        max_size=60,
    )
)
def test_prefix_sum_matches_python_cumsum(spark, key_vals):
    """global_running_sum over arbitrary (hash-key, value) rows == the
    obvious Python model: sort by (key, rid), running-sum the values.
    Duplicate keys are likely at this range via hypothesis shrinking, so
    the tiebreak path is exercised."""
    from devcontainers_etl_node_spark.operators import prefixsum

    rows = [(i, k, v) for i, (k, v) in enumerate(key_vals)]
    df = spark.createDataFrame(rows, "rid long, h long, v long")
    got = {
        r.rid: r.cum
        for r in prefixsum.global_running_sum(df, "h", ["rid"], "v", n_buckets=8).collect()
    }
    acc = 0
    expected = {}
    for rid, _k, v in sorted(rows, key=lambda r: (r[1], r[0])):
        acc += v
        expected[rid] = acc
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 12), min_size=1, max_size=14),
        min_size=1,
        max_size=25,
    ),
    st.sampled_from([0.3, 0.5, 0.7]),
)
def test_setsim_preflight_dict_df_parity(spark, token_docs, threshold):
    """The driver-side histogram probe and the distributed integer-exact
    DF form agree on every corpus shape hypothesis draws: corpus stats
    exactly, head occupancy within the dict's reported rounding, the
    singleton-screen within the float-vs-integer pro-rata rounding of
    the boundary class (<= 1)."""
    from devcontainers_etl_node_spark.operators.retrieval import (
        setsim_preflight,
        setsim_preflight_df,
    )

    rows = [
        (i, " ".join(f"t{t}" for t in toks)) for i, toks in enumerate(token_docs)
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    probe = setsim_preflight(docs, threshold)
    out = setsim_preflight_df(docs, threshold).collect()
    if probe["total_grams"] == 0:
        assert out == [] or out[0]["total_grams"] == 0
        return
    row = out[0]
    assert row["n_docs"] == probe["n_docs"]
    assert row["total_grams"] == probe["total_grams"]
    assert row["distinct_grams"] == probe["distinct_grams"]
    assert row["prefix_mass"] == probe["prefix_mass"]
    assert abs(row["singleton_screen_x2"] / 2 - probe["predicted_candidates"]) <= 1
    # dict reports head MASS (occ/total, rounded 4dp); DF reports occ
    assert abs(row["head_occ"] - probe["head_mass"] * probe["total_grams"]) <= 1
    assert row["raw_prefix_collisions"] >= 0
