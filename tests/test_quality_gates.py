"""Quality gates for approximate operators: the rows-only catalog entries
(ann_lsh, ann_ivf, hll_mergeable) carry no SQL oracle by design, so these
tests pin their *accuracy* against exact ground truth instead.

Recall knob sweep at sf0.01 (measured, deterministic — seeded hyperplanes
and KMeans seed):
    lsh  tables=8  planes=4: 0.60   tables=16 planes=4: 0.88
    lsh  tables=12 planes=3: 0.96   tables=24 planes=4: 0.96
    lsh  multi-probe (Hamming-1): tables=4: 0.88  tables=6: 1.00  tables=8: 1.00
    ivf  cent=16 probe=4: 0.72      cent=16 probe=6: 0.84
    ivf  cent=16 probe=8: 0.96
    pq   m=8 codes=32 rerank=8: 0.80   m=16 codes=32 rerank=8: 1.00
The catalog entries use lsh tables=6 + Hamming-1 multi-probe (r5: equals
or beats 16 exact-probe tables at under half the corpus-side bucket
compute) and ivf n_probe=6 — the cheapest settings clearing the 0.8 gate
with margin.
"""

import pyspark.sql.functions as F
import pytest

from devcontainers_etl_node_spark.catalog import table
from devcontainers_etl_node_spark.queries.catalog import QUERIES

SF = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def knn_truth(spark):
    rows = QUERIES["knn_cosine"](spark, SF).collect()
    return {(r.query_id, r.neighbor_id) for r in rows}


def _recall(spark, name, truth):
    got = {(r.query_id, r.neighbor_id) for r in QUERIES[name](spark, SF).collect()}
    return len(got & truth) / len(truth)


def test_ann_lsh_recall_at_5(spark, knn_truth):
    assert _recall(spark, "ann_lsh", knn_truth) >= 0.8


def test_ann_ivf_recall_at_5(spark, knn_truth):
    assert _recall(spark, "ann_ivf", knn_truth) >= 0.8


def test_ann_pq_recall_at_5(spark, knn_truth):
    assert _recall(spark, "ann_pq", knn_truth) >= 0.8


def test_ann_ivfpq_recall_at_5(spark, knn_truth):
    # measured 0.88 at n_cells=16/n_probe=10/m=16/codes=32 (seeded)
    assert _recall(spark, "ann_ivfpq", knn_truth) >= 0.8


def test_hll_mergeable_within_5pct_of_exact(spark):
    est = {r.day: r.est_users for r in QUERIES["hll_mergeable"](spark, SF).collect()}
    exact = {
        str(r.day): r.n
        for r in table(spark, SF, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for day, e in est.items():
        assert abs(e - exact[day]) / exact[day] <= 0.05, day


def test_countmin_never_underestimates_and_is_tight(spark):
    """Relational count-min (countmin_userid query): every estimate must be
    >= the exact per-user count (one-sided error is the count-min
    guarantee) and within +5% of exact for the probed heavy users at this
    sketch size."""
    est = {r.user_id: r.est_n for r in QUERIES["countmin_userid"](spark, SF).collect()}
    ev = table(spark, SF, "events")
    exact = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
        if r.user_id in est
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n, (k, n, est[k])
        assert est[k] <= n * 1.05 + 2, (k, n, est[k])


def test_pretrain_prep_funnel_invariants(spark):
    """The pretraining funnel must be monotone (each stage keeps <= docs
    and <= tokens of the previous relational stage), strictly filtering
    where the corpus has known dups/contamination, and the packed stage's
    token mass must equal the decontaminated stage's (packing reorganizes,
    never drops)."""
    rows = {r.stage: r for r in QUERIES["pretrain_prep"](spark, SF).collect()}
    assert set(rows) == {"raw", "quality_gate", "exact_dedup", "near_dedup", "decontaminated", "packed"}
    order = ["raw", "quality_gate", "exact_dedup", "near_dedup", "decontaminated"]
    for a, b in zip(order, order[1:]):
        assert rows[b].docs <= rows[a].docs, (a, b)
        assert rows[b].tokens <= rows[a].tokens, (a, b)
    # corpus has near-dups and a benchmark slice — those stages strictly filter
    assert rows["near_dedup"].docs < rows["exact_dedup"].docs
    assert rows["decontaminated"].docs < rows["near_dedup"].docs
    assert rows["packed"].tokens == rows["decontaminated"].tokens
    # sequences are fuller than one-doc-per-sequence would be
    assert rows["packed"].docs < rows["decontaminated"].docs


def test_lang_id_classifies_distinctive_text(spark):
    """The corpus lang labels are random w.r.t. the (uniform synthetic)
    text, so corpus accuracy is meaningless by construction; the
    behavioral gate instead: on text carrying each language's stopword
    evidence, lang_id must pick that language, and evidence-free text
    must map to 'und'."""
    from devcontainers_etl_node_spark.operators.text import lang_id

    rows = [
        ("en", "the cat sat on the mat and it is happy"),
        ("es", "el perro y la casa que es de los vecinos"),
        ("de", "der hund und die katze das ist ein tier"),
        ("fr", "le chien et la maison est une des belles"),
        ("zh", "我 是 人 这 不 了 和 有 在 的"),
        ("und", "xylophone quartz zebra"),
    ]
    df = spark.createDataFrame(rows, "expected string, text string")
    out = df.select("expected", lang_id("text").alias("pred")).collect()
    for r in out:
        assert r.pred == r.expected, (r.expected, r.pred)


def test_percentile_approx_within_5pct_of_exact(spark):
    """approx percentiles (rows-only entry) must land within 5% relative
    of the exact per-group percentiles."""
    approx = {r.event_type: (r.p50_approx, r.p95_approx) for r in QUERIES["percentile_approx"](spark, SF).collect()}
    ev = table(spark, SF, "events")
    exact = {
        r.event_type: (r.p50, r.p95)
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        for a, e in zip(approx[k], exact[k]):
            assert abs(a - e) / abs(e) <= 0.05, (k, a, e)


def test_stratified_sample_respects_fractions(spark):
    """sampleBy fractions (rows-only entry): each stratum's realized rate
    must be in a Bernoulli-plausible band around its target, and the
    zh stratum (fraction 1.0) must be complete."""
    got = {r.lang: r.n_sampled for r in QUERIES["stratified_sample"](spark, SF).collect()}
    totals = {
        r.lang: r.n
        for r in table(spark, SF, "documents").groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    targets = {"en": 0.1, "es": 0.5, "de": 0.5, "fr": 0.5, "zh": 1.0}
    assert got["zh"] == totals["zh"]
    for lang, frac in targets.items():
        rate = got.get(lang, 0) / totals[lang]
        assert abs(rate - frac) <= 0.2, (lang, rate, frac)


def test_approx_distinct_within_5pct_of_exact(spark):
    """approx_count_distinct (rows-only entry) within 5% of exact NDV."""
    approx = {r.o_orderpriority: r.approx_customers for r in QUERIES["approx_distinct"](spark, SF).collect()}
    o = table(spark, SF, "orders")
    exact = {
        r.o_orderpriority: r.n
        for r in o.groupBy("o_orderpriority").agg(F.countDistinct("o_custkey").alias("n")).collect()
    }
    assert set(approx) == set(exact)
    for k, e in approx.items():
        assert abs(e - exact[k]) / exact[k] <= 0.05, (k, e, exact[k])


def test_substring_dup_stats_invariants(spark):
    """Oracled at sf0.01; these pin the semantic invariants the hash
    match can't state: coverage is a true span union (bounded by both
    n_tokens and k*n_dup_grams), fractions live in [0,1], and a doc with
    no 8-token window (short doc) reports zero duplication."""
    rows = {r.doc_id: r for r in QUERIES["substring_dup_stats"](spark, SF).collect()}
    assert rows
    for r in rows.values():
        assert 0.0 <= r.dup_fraction <= 1.0
        assert r.covered_tokens <= r.n_tokens
        assert r.covered_tokens <= 8 * r.n_dup_grams
        if r.n_dup_grams > 0:
            assert r.covered_tokens >= 8  # one dup window covers >= k tokens
        if r.n_tokens < 8:
            assert r.n_dup_grams == 0 and r.covered_tokens == 0


def test_substring_dup_detects_planted_cross_doc_span(spark):
    """A 12-token span planted in two docs must be flagged in both, with
    coverage of exactly the shared span (the surrounding unique text must
    NOT count)."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    rows = [
        (1, f"{shared} unique tail one two three four five six seven eight nine"),
        (2, f"opening words here differ substantially {shared}"),
        (3, "entirely unrelated content with twelve different words in this document body"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # run the same pipeline inline (k=8) against the planted corpus
    from pyspark.sql import functions as F2

    k = 8
    t = F2.split(F2.lower(F2.trim("text")), r"\s+")
    base = df.select("doc_id", t.alias("t")).withColumn("n", F2.size("t"))
    grams = (
        base.filter(F2.col("n") >= k)
        .select("doc_id", F2.explode(F2.sequence(F2.lit(1), F2.col("n") - (k - 1))).alias("pos"), "t")
        .select("doc_id", "pos", F2.xxhash64(F2.concat_ws(" ", F2.slice("t", F2.col("pos"), k))).alias("g"))
    )
    dup = grams.groupBy("g").agg(F2.countDistinct("doc_id").alias("nd")).filter(F2.col("nd") >= 2)
    covered = (
        grams.join(dup.select("g"), "g")
        .select("doc_id", F2.explode(F2.sequence(F2.col("pos"), F2.col("pos") + (k - 1))).alias("j"))
        .groupBy("doc_id")
        .agg(F2.countDistinct("j").alias("covered"))
    )
    got = {r.doc_id: r.covered for r in covered.collect()}
    assert got.get(1) == 12 and got.get(2) == 12  # exactly the shared span
    assert 3 not in got


def test_vocab_tokenize_invariants(spark):
    """ids_prefix length, OOV bounds, and vocabulary determinism: re-running
    yields identical outputs (vocab ties are broken by token text)."""
    out1 = {r.doc_id: r for r in QUERIES["vocab_tokenize"](spark, SF).collect()}
    out2 = {r.doc_id: r for r in QUERIES["vocab_tokenize"](spark, SF).collect()}
    assert out1.keys() == out2.keys()
    for doc_id, r in out1.items():
        assert r.n_oov <= r.n_tokens
        ids = r.ids_prefix.split(",")
        assert len(ids) == min(12, r.n_tokens)
        assert all(i == "-1" or 0 <= int(i) <= 255 for i in ids)
        assert out2[doc_id].ids_prefix == r.ids_prefix


def test_pca_whiten_properties(spark):
    """Whitening contract: the output's empirical covariance is the
    identity on k dims (decorrelated, unit variance), the transform is
    deterministic across runs (eigenvector sign convention pinned), and
    the projection preserves row identity."""
    import numpy as np

    from devcontainers_etl_node_spark.catalog import table as _t
    from devcontainers_etl_node_spark.operators.similarity import pca_whiten

    emb = _t(spark, SF, "embeddings")
    out1 = {r.vec_id: r.whitened for r in pca_whiten(emb, k=8).collect()}
    out2 = {r.vec_id: r.whitened for r in pca_whiten(emb, k=8).collect()}
    assert out1.keys() == out2.keys() and len(out1) == emb.count()
    assert all(out1[i] == out2[i] for i in out1)  # deterministic

    Y = np.asarray([out1[i] for i in sorted(out1)])
    assert Y.shape[1] == 8
    cov = np.cov(Y, rowvar=False)
    assert np.abs(cov - np.eye(8)).max() < 1e-6  # identity covariance


def test_cluster_safe_split_never_straddles_a_dup_cluster(spark):
    """The leakage invariant cluster_safe_split exists for: every
    connected component of near-duplicates lands in exactly ONE split
    (per-doc hashing — plain hash_split — breaks this whenever a near-dup
    pair's md5 buckets differ, which the second assertion proves happens
    on this very corpus, so the invariant is non-vacuous here)."""
    from devcontainers_etl_node_spark.operators import dedup as dedup_ops
    from devcontainers_etl_node_spark.operators import graph

    docs = table(spark, SF, "documents")
    pairs = dedup_ops.shared_ngram_pairs(
        docs, SF, ngram=3, threshold=0.2, block_col="lang"
    ).select("id_a", "id_b")
    labels = graph.shared_components(pairs, SF, src="id_a", dst="id_b")

    def split_of(key_col):
        b = F.conv(F.substring(F.md5(key_col.cast("string")), 1, 8), 16, 10).cast("long") % 100
        return F.when(b < 90, "train").when(b < 95, "val").otherwise("test")

    # cluster-keyed assignment: one split per component, always
    per_comp = (
        labels.select("component", split_of(F.col("component")).alias("split"))
        .groupBy("component")
        .agg(F.countDistinct("split").alias("n_splits"))
    )
    assert per_comp.filter(F.col("n_splits") > 1).count() == 0

    # doc-keyed assignment (hash_split's rule) DOES straddle a component:
    # plant a 2-member cluster whose member ids provably hash to different
    # splits (found by the same md5-bucket rule in pure Python, so the
    # demonstration is deterministic, not corpus luck)
    import hashlib

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100

    a = next(i for i in range(10_000) if bucket(i) < 90)
    b = next(i for i in range(10_000) if bucket(i) >= 95)
    planted = spark.createDataFrame([(a, b)], "node: long, peer: long")
    planted_labels = planted.selectExpr("node", "node as component").union(
        planted.selectExpr("peer as node", "node as component")
    )
    straddled = (
        planted_labels.select("component", split_of(F.col("node")).alias("split"))
        .groupBy("component")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddled == 1
    # while the cluster-keyed rule keeps that same planted pair together
    one = (
        planted_labels.select("component", split_of(F.col("component")).alias("split"))
        .groupBy("component")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert one == 0

    # and the catalog entry's totals account for every document once
    out = {r.split: r for r in QUERIES["cluster_safe_split"](spark, SF).collect()}
    assert sum(r.n_docs for r in out.values()) == docs.count()
    assert all(r.n_dup_docs <= r.n_docs for r in out.values())


def test_bloom_screen_zero_false_negatives_and_bounded_fp(spark):
    """The Bloom decontamination screen's two contract halves, against
    exact ground truth on the sf0.001 corpus:

    1. ZERO false negatives — every doc sharing >= 1 gram with the
       benchmark set is flagged by the screen (the Bloom property; this
       is what makes screen-then-recheck semantically exact). This gate
       also pins the bitwise_or.at packing fix: fancy-indexed ``|=``
       drops bits when two positions share a byte, which surfaced as 13
       false-negative docs at sf0.01.
    2. Bounded false positives — the spurious-flag rate among truly
       clean docs stays under 5% at the default m=2^20 / k=4 (measured
       ~0 here; the recheck removes whatever remains).
    """
    from devcontainers_etl_node_spark.operators import dedup, membership

    sfd = "/root/testdata/sf0.001"
    docs = table(spark, sfd, "documents")
    grams = docs.select("doc_id", F.explode(dedup.word_shingles("text", 3)).alias("gram"))
    bench_grams = grams.filter(F.col("doc_id") % 10 == 0).select("gram").distinct()
    bits = membership.bloom_build(bench_grams)

    cand = docs.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id", dedup.word_shingles("text", 3).alias("grams")
    )
    flags = {
        r.doc_id: r.bloom_hit for r in membership.bloom_probe_docs(cand, bits).collect()
    }
    exact = {
        r.doc_id
        for r in grams.filter(F.col("doc_id") % 10 != 0)
        .join(bench_grams, "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .collect()
    }
    flagged = {d for d, h in flags.items() if h}
    missed = exact - flagged
    assert not missed, f"Bloom screen false negatives: {sorted(missed)[:5]}"
    clean = set(flags) - exact
    fp_rate = len(flagged - exact) / max(1, len(clean))
    assert fp_rate < 0.05, f"FP rate {fp_rate:.3f} above bound at m=2^20/k=4"


def test_bloom_decontaminate_equals_plain_exact_contamination(spark):
    """screen-then-recheck ≡ exact: the bloom_decontaminate catalog entry
    must return row-for-row the same result as contamination_check (they
    share one oracle SQL; this pins the identity engine-side too)."""
    a = {tuple(r) for r in QUERIES["bloom_decontaminate"](spark, SF_SMALL).collect()}
    b = {tuple(r) for r in QUERIES["contamination_check"](spark, SF_SMALL).collect()}
    assert a == b


@pytest.fixture(scope="module")
def planted_corpus(spark, tmp_path_factory):
    """A tiny documents table with planted leak/repetition structure,
    written as a real parquet corpus so the catalog entries run END-TO-END
    (doc_id%10==0 is the benchmark slice the entries key on):

    - 10, 20 (bench): the "eval set" — 10 tokens each.
    - 1: unique 8-token prefix + doc 10's full text + unique 8-token
         suffix → exactly the copied 10 tokens are contaminated spans.
    - 2: 12 unique tokens, disjoint from everything → passes verbatim.
    - 3: a 10-token unit repeated twice + a distinct 10-token tail →
         intra-doc repetition (kept once).
    - 4: the SAME unit as doc 3, once → cross-doc repetition only
         (intradoc_dedup must NOT touch it).
    - 5: verbatim copy of bench doc 20 → fully contaminated (drops out
         of the span-clean output; every bigram is ref-seen).
    """
    unit = " ".join(f"u{i}" for i in range(10))
    tail = " ".join(f"t{i}" for i in range(10))
    bench10 = "the quick brown fox jumps over the lazy dog tonight"
    bench20 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (10, bench10),
        (20, bench20),
        (1, " ".join(f"p{i}" for i in range(8)) + f" {bench10} " + " ".join(f"s{i}" for i in range(8))),
        (2, "one two three four five six seven eight nine ten eleven twelve"),
        (3, f"{unit} {unit} {tail}"),
        (4, unit),
        (5, bench20),
    ]
    d = tmp_path_factory.mktemp("planted_sf")
    spark.createDataFrame(
        [(i, txt, "en", f"src{i}", len(txt)) for i, txt in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_contamination_span_clean_cuts_exactly_the_leaked_span(spark, planted_corpus):
    out = {r.doc_id: r for r in QUERIES["contamination_span_clean"](spark, planted_corpus).collect()}
    # bench docs are never in the output (training side only)
    assert 10 not in out and 20 not in out
    # doc 1: exactly the copied 10 tokens cut; prefix+suffix survive in order
    assert out[1].n_tokens == 26 and out[1].n_kept == 16
    assert out[1].clean_text == " ".join(f"p{i}" for i in range(8)) + " " + " ".join(
        f"s{i}" for i in range(8)
    )
    # doc 2: untouched (n_kept == n_tokens, text verbatim modulo lowering)
    assert out[2].n_kept == out[2].n_tokens == 12
    assert out[2].clean_text == "one two three four five six seven eight nine ten eleven twelve"
    # doc 5 is a verbatim benchmark copy: nothing kept -> absent entirely
    assert 5 not in out


def test_intradoc_dedup_drops_only_within_doc_repeats(spark, planted_corpus):
    out = {r.doc_id: r for r in QUERIES["intradoc_dedup"](spark, planted_corpus).collect()}
    unit = " ".join(f"u{i}" for i in range(10))
    tail = " ".join(f"t{i}" for i in range(10))
    # doc 3: 3 units, the repeated one kept once
    assert out[3].n_units == 3 and out[3].kept_units == 2
    assert out[3].new_text == f"{unit} {tail}"
    # doc 4 shares doc 3's unit but has no INTERNAL repeat: untouched
    assert out[4].n_units == out[4].kept_units == 1
    assert out[4].new_text == unit
    # unique docs pass through whole
    assert out[2].n_units == out[2].kept_units


def test_bigram_lm_score_separates_in_domain_from_ood(spark, planted_corpus):
    out = {r.doc_id: r for r in QUERIES["bigram_lm_score"](spark, planted_corpus).collect()}
    # doc 5 == bench doc 20: all 9 bigrams in the reference model, each once
    assert out[5].n_bigrams == 9 and out[5].n_unseen == 0
    assert out[5].min_ref_count == 1 and out[5].sum_ref_count == 9
    # doc 2 is fully out-of-domain: every bigram unseen, zero mass
    assert out[2].n_unseen == out[2].n_bigrams == 11
    assert out[2].min_ref_count == 0 and out[2].sum_ref_count == 0
    # doc 1 embeds bench doc 10: its 9 interior bigrams are seen, the
    # 2 seam bigrams (p7->the, tonight->s0) and 14 affix bigrams are not
    assert out[1].n_bigrams == 25 and out[1].n_unseen == 16


def test_token_shard_pack_shards_are_budget_sized_and_conserving(spark):
    """Shard packing must conserve tokens exactly and produce shards
    whose totals sit within one max-document of the 4096-token budget
    (assignment is by starting offset, so a shard can only over/under-
    run by the one doc straddling its boundary)."""
    rows = QUERIES["token_shard_pack"](spark, SF).collect()
    total = sum(r.n_tokens for r in rows)
    max_doc = max(r.n_tokens for r in rows)
    shards: dict[int, int] = {}
    for r in rows:
        shards[r.shard_id] = shards.get(r.shard_id, 0) + r.n_tokens
    assert sum(shards.values()) == total
    assert set(shards) == set(range(len(shards)))  # dense ids, no holes
    last = max(shards)
    for sid, tok in shards.items():
        if sid != last:
            assert 4096 - max_doc <= tok <= 4096 + max_doc, (sid, tok, max_doc)


def test_quality_classifier_beats_majority_baseline(spark):
    """The trained hashed-feature quality filter must generalize the weak
    rule to held-out docs: accuracy >= 0.72 (measured 0.78-0.79 at
    sf0.01) and at least +0.10 over always-predicting the majority
    class — the bar a learned filter must clear before replacing its
    labeling rule."""
    cm = {(r.label, r.prediction): r.n for r in QUERIES["quality_classifier"](spark, SF).collect()}
    total = sum(cm.values())
    acc = (cm.get((0, 0), 0) + cm.get((1, 1), 0)) / total
    n_pos = cm.get((1, 0), 0) + cm.get((1, 1), 0)
    majority = max(n_pos, total - n_pos) / total
    assert acc >= 0.72, (acc, cm)
    assert acc >= majority + 0.10, (acc, majority, cm)


def test_pretrain_prep_degrades_to_lang_blocking_without_source(spark, tmp_path):
    """r13 review fix: a documents corpus WITHOUT a source column must
    still run pretrain_prep (blocking degrades to lang alone via
    default_block_cols) instead of failing analysis on a hard-selected
    column."""
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(30)), "en")
        for i in range(1, 30)
    ]
    d = tmp_path / "nosrc"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    out = {r.stage: r for r in QUERIES["pretrain_prep"](spark, str(d)).collect()}
    assert set(out) == {
        "raw", "quality_gate", "exact_dedup", "near_dedup", "decontaminated", "packed"
    }
    assert out["raw"].docs == 29
