"""Unit gates for operators/retrieval.py: BM25 inverted-index retrieval and
the prefix-filtered exact Jaccard self-join.

The catalog oracles (bm25_retrieval / setsim_selfjoin) already hash-check
both against DuckDB on the corpus; these tests pin the ALGORITHMIC
properties on constructed inputs where ground truth is computable by hand
or brute force:

- prefix-filter completeness: every pair the brute-force all-pairs join
  finds at threshold t is found by the pruned join (the lemma in code);
- BM25 ranking behavior: term-frequency monotonicity, rare-term dominance,
  and length normalization (b) direction.
"""

from __future__ import annotations

import itertools

import pytest

from devcontainers_etl_node_spark.operators import retrieval


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )


# ---------------------------------------------------------------------------
# setsim_join_prefix
# ---------------------------------------------------------------------------


def _brute_pairs(texts, threshold, ngram):
    def grams(t):
        toks = t.lower().strip().split()
        if len(toks) <= ngram:
            return {" ".join(toks[: max(len(toks), 1)])} if toks else {""}
        return {" ".join(toks[i : i + ngram]) for i in range(len(toks) - ngram + 1)}

    gs = [grams(t) for t in texts]
    out = set()
    for a, b in itertools.combinations(range(len(texts)), 2):
        inter = len(gs[a] & gs[b])
        uni = len(gs[a] | gs[b])
        if uni and inter / uni >= threshold:
            out.add((a, b))
    return out


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_setsim_prefix_matches_bruteforce(spark, threshold):
    """Pruned join == brute force on a corpus with planted near-dups,
    exact dups, and unrelated docs — at several thresholds (the prefix
    length formula depends on t, so each t exercises a different prune)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [
        base,
        base,  # exact dup of 0
        base.replace("delta", "DELTA-X"),  # near dup of 0
        "alpha beta gamma " + base,  # prefix-extended variant
        "one two three four five six seven eight nine ten",
        "totally different words entirely here nothing shared at all ok",
        "alpha beta gamma delta epsilon zeta eta theta iota omega",  # tail edit
        "x y z " * 5,
    ]
    got = {
        (r["id_a"], r["id_b"])
        for r in retrieval.setsim_join_prefix(
            _docs_df(spark, texts), threshold=threshold, ngram=3
        ).collect()
    }
    assert got == _brute_pairs(texts, threshold, 3)


def test_setsim_prefix_jaccard_values_exact(spark):
    """inter/uni/jaccard columns are the exact set statistics."""
    texts = [
        "a b c d e f",  # grams: "a b c","b c d","c d e","d e f" (4)
        "a b c d e x",  # grams: "a b c","b c d","c d e","d e x" (4), inter 3
    ]
    rows = retrieval.setsim_join_prefix(
        _docs_df(spark, texts), threshold=0.5, ngram=3
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"], r["inter"], r["uni"]) == (0, 1, 3, 5)
    assert r["jaccard_sim"] == 3 / 5


# ---------------------------------------------------------------------------
# bm25_topk
# ---------------------------------------------------------------------------


def test_bm25_tf_monotonic_same_length(spark):
    """Among equal-length docs, more query-term occurrences => higher
    score (tf monotonicity with dl fixed)."""
    texts = [
        "cat dog dog dog filler filler",
        "cat cat dog dog filler filler",
        "cat cat cat dog dog filler",
        "filler filler filler filler filler filler",
    ]
    out = retrieval.bm25_topk(_docs_df(spark, texts), [(1, ["cat"])], k=4).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [2, 1, 0]  # doc 3 has no 'cat' => absent entirely


def test_bm25_rare_term_outweighs_common(spark):
    """A hit on a rare term scores above a hit on a ubiquitous term
    (idf direction), same tf and dl."""
    texts = [
        "common rare pad1 pad2",
        "common word1 pad1 pad2",
        "common word2 pad1 pad2",
        "common word3 pad1 pad2",
    ]
    out = retrieval.bm25_topk(
        _docs_df(spark, texts), [(1, ["rare", "common"])], k=4
    ).collect()
    top = min(out, key=lambda r: r["rank"])
    assert top["doc_id"] == 0  # the only doc matching the rare term wins


def test_bm25_length_normalization(spark):
    """Same tf, shorter doc scores higher (b > 0 penalizes long docs)."""
    texts = [
        "needle pad",
        "needle pad pad pad pad pad pad pad pad pad pad pad pad pad",
    ]
    out = retrieval.bm25_topk(_docs_df(spark, texts), [(7, ["needle"])], k=2).collect()
    by_rank = sorted(out, key=lambda r: r["rank"])
    assert [r["doc_id"] for r in by_rank] == [0, 1]
    assert by_rank[0]["score_micros"] > by_rank[1]["score_micros"]


def test_bm25_shared_term_across_queries_df_not_inflated(spark):
    """Two queries sharing a term must see the same per-term df: the
    scores for the shared term are identical across queries (regression
    for computing df AFTER the query join, which double-counts)."""
    texts = ["shared only", "shared thing", "other stuff"]
    out = retrieval.bm25_topk(
        _docs_df(spark, texts), [(1, ["shared"]), (2, ["shared"])], k=3
    ).collect()
    q1 = {r["doc_id"]: r["score_micros"] for r in out if r["query_id"] == 1}
    q2 = {r["doc_id"]: r["score_micros"] for r in out if r["query_id"] == 2}
    assert q1 == q2 and len(q1) == 2


def test_bm25_topk_cap_and_tiebreak(spark):
    """k caps output; equal scores tie-break by doc_id ascending."""
    texts = ["tok pad"] * 6  # identical docs: identical scores
    out = retrieval.bm25_topk(_docs_df(spark, texts), [(1, ["tok"])], k=3).collect()
    assert sorted((r["rank"], r["doc_id"]) for r in out) == [(1, 0), (2, 1), (3, 2)]


# ---------------------------------------------------------------------------
# Property: the prefix+size+position prune is lossless on random corpora
# ---------------------------------------------------------------------------


def test_setsim_prune_lossless_randomized(spark):
    """Randomized completeness sweep: many small corpora drawn from a tiny
    vocabulary (maximizing shared shingles, the adversarial case for the
    position filter) — the pruned join must equal brute force at every
    threshold, including ones whose binary repr sits above the decimal
    (0.1: the ceil-overestimate trap the epsilon slack guards)."""
    import random

    rng = random.Random(0xC0FFEE)
    vocab = ["a", "b", "c", "d", "e", "f"]
    for trial in range(6):
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 14)))
            for _ in range(12)
        ]
        for threshold in (0.1, 0.34, 0.67):
            got = {
                (r["id_a"], r["id_b"])
                for r in retrieval.setsim_join_prefix(
                    _docs_df(spark, texts), threshold=threshold, ngram=3
                ).collect()
            }
            want = _brute_pairs(texts, threshold, 3)
            assert got == want, (trial, threshold, got ^ want)


def test_setsim_preflight_probe_and_df_agree(spark):
    """The driver-side dict probe and the distributed integer-exact DF
    form compute the same rarest-first fill: predicted_collisions_x2/2
    == the dict's predicted_candidates (up to the dict's float pro-rata
    on the boundary class), and the corpus stats match exactly.  The
    prediction must also UPPER-bound the true raw prefix collisions on a
    corpus with uniform doc lengths (the probe's stated regime)."""
    import random

    from pyspark.sql import Window, functions as F

    from devcontainers_etl_node_spark.operators.retrieval import (
        _gram_rows,
        setsim_preflight,
        setsim_preflight_df,
    )

    rng = random.Random(5)
    vocab = [f"tok{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(10)) for _ in range(60)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    probe = setsim_preflight(docs, 0.5)
    row = setsim_preflight_df(docs, 0.5).collect()[0]
    assert row["n_docs"] == probe["n_docs"] == 60
    assert row["total_grams"] == probe["total_grams"]
    assert row["distinct_grams"] == probe["distinct_grams"]
    assert row["prefix_mass"] == probe["prefix_mass"]
    assert abs(row["singleton_screen_x2"] / 2 - probe["predicted_candidates"]) <= 1

    # ground truth: raw prefix-bucket collisions from the operator's own
    # prefix relation — the probe upper-bounds it (uniform doc lengths)
    grams = _gram_rows(docs, "text", "doc_id", 3)
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    gfreq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("gdf"))
    prefix = (
        grams.join(gfreq, "gram")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.col("gdf"), F.col("gram"))
            ),
        )
        .join(sizes, "doc_id")
        .filter(F.col("pos") <= F.col("sz") - F.ceil(F.lit(0.5) * F.col("sz") - F.lit(1e-6)) + 1)
    )
    raw = (
        prefix.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("b"))
        .agg(F.sum(F.col("b") * (F.col("b") - 1) / 2).alias("raw"))
        .collect()[0]["raw"]
    )
    # the histogram screen upper-bounds raw ONLY in the iid regime this
    # uniform corpus satisfies (the Zipf/dup-mixture case where it reads
    # 0 is the measured limitation documented on setsim_preflight)
    assert probe["predicted_candidates"] >= raw
    # the census column is EXACT — equal to the operator's own relation
    assert row["raw_prefix_collisions"] == int(raw)

    # empty corpus: typed zero row, no division errors — and the DF twin
    # returns the SAME explicit one-row zero record (r12 advice: an empty
    # histogram previously made the groupBy produce ZERO rows, so a
    # .collect()[0] caller IndexError'd and oracle parity diverged)
    empty = spark.createDataFrame([], "doc_id LONG, text STRING")
    p0 = setsim_preflight(empty, 0.5)
    assert p0["n_docs"] == 0 and p0["predicted_candidates"] == 0
    zrows = setsim_preflight_df(empty, 0.5).collect()
    assert len(zrows) == 1
    z = zrows[0]
    assert z["n_docs"] == 0 and z["total_grams"] == 0
    assert z["singleton_screen_x2"] == 0 and z["raw_prefix_collisions"] == 0
    assert z["max_bucket"] == 0 and z["head_occ"] == 0


def test_setsim_budget_gate(spark):
    """max_collisions_per_doc: a boilerplate corpus (every doc shares a
    template) trips the census gate with the measured volume and the
    minhash recommendation in the message; a diverse corpus under the
    same budget runs; default (None) never runs the census."""
    import pytest as _pytest

    from devcontainers_etl_node_spark.operators.retrieval import setsim_join_prefix

    template = "terms of service apply to all content on this page " * 3
    boiler = spark.createDataFrame(
        [(i, template + f"suffix {i}") for i in range(30)],
        "doc_id LONG, text STRING",
    )
    with _pytest.raises(ValueError, match="pre-flight budget exceeded.*minhash"):
        setsim_join_prefix(boiler, threshold=0.5, max_collisions_per_doc=2.0)
    # same corpus, budget off: still computable (exact, just expensive)
    assert setsim_join_prefix(boiler, threshold=0.5).count() > 0

    import random

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(500)]
    diverse = spark.createDataFrame(
        [(i, " ".join(rng.choice(vocab) for _ in range(12))) for i in range(30)],
        "doc_id LONG, text STRING",
    )
    setsim_join_prefix(diverse, threshold=0.5, max_collisions_per_doc=2.0).count()
