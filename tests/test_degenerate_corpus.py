"""Degenerate-corpus adversarial gate for the dedup/retrieval/ANN
family — the shapes that break banding, prefix math and idf arithmetic
(division by zero, ceil bounds at t=1, shingle windows past the text):

- a SINGLE document (no pair can exist),
- ALL-IDENTICAL documents (every pair is a dup at jaccard 1.0),
- ONE-CHARACTER documents (shingle window longer than the text),
- a VOCABULARY OF ONE word (every ngram/idf statistic collapses).

Extends the round-9 empty-corpus gate (tests/test_empty_corpus.py):
every entry must either return a sane result or raise a DESCRIPTIVE
ValueError — never a raw engine error — and where the degenerate shape
pins an exact answer, the answer is asserted, not just the absence of a
stack trace."""

from __future__ import annotations

import glob
import os
import shutil

import pytest

DOC_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"

# documents-reading entries across the dedup / fingerprint / retrieval /
# curation families (the ANN family reads embeddings — separate fixture)
DOC_ENTRIES = [
    "dedup_exact",
    "minhash_neardup",
    "setsim_selfjoin",
    "dup_clusters",
    "line_dedup",
    "simhash_fingerprints",
    "winnow_fingerprints",
    "intradoc_dedup",
    "substring_dedup_clean",
    "contamination_threshold",
    "bm25_retrieval",
    "token_stats",
    "pretrain_prep",
    "ccnet_perplexity_buckets",
]
EMB_ENTRIES = ["knn_cosine", "ann_lsh", "semantic_dedup"]


def _docs(kind: str) -> list[tuple]:
    base = "spark engine corpus document with plenty of ordinary words " * 4
    if kind == "single_doc":
        texts = [base]
    elif kind == "all_identical":
        texts = [base] * 50
    elif kind == "one_char":
        texts = [("a", "b", "c")[i % 3] for i in range(30)]
    elif kind == "vocab_of_one":
        texts = [" ".join(["w"] * (i + 1)) for i in range(40)]
    elif kind == "unicode":
        # multibyte codepoints exercise CHARACTER (not byte) substr/length
        # semantics through every shingle/ngram/fingerprint path: CJK,
        # emoji, combining accents, RTL, plus near-dup unicode families
        words = ["数据", "חיפוש", "café́", "🚀rocket", "Παράδειγμα", "répétition"]
        texts = []
        for i in range(24):
            fam = i // 4
            # family-unique multibyte vocabulary: members share 12 words,
            # families share none (cross-family jaccard ~ 0)
            texts.append(
                " ".join(f"{words[j % len(words)]}{fam}甲{j}" for j in range(12))
                + f" 尾{i % 4}"
            )
    else:
        raise AssertionError(kind)
    return [
        (i, t, "en", "degenerate", len(t)) for i, t in enumerate(texts)
    ]


@pytest.fixture(scope="module")
def degenerate_sfs(spark, tmp_path_factory):
    """One sf-dir per shape: every real sf0.001 table copied, documents
    replaced by the degenerate corpus."""
    out = {}
    for kind in ("single_doc", "all_identical", "one_char", "vocab_of_one", "unicode"):
        d = tmp_path_factory.mktemp(f"sf_{kind}")
        for p in glob.glob("/root/testdata/sf0.001/*.parquet"):
            if not os.path.basename(p).startswith("documents"):
                shutil.copy(p, d / os.path.basename(p))
        spark.createDataFrame(_docs(kind), DOC_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(d / "documents.parquet"))
        out[kind] = str(d)
    return out


@pytest.fixture(scope="module")
def degenerate_emb_sfs(spark, tmp_path_factory):
    """Embedding shapes: all-identical vectors and all-zero vectors
    (cosine's division-by-zero shape)."""
    import numpy as np

    dim = len(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .first()["embedding"]
    )
    out = {}
    for kind, vec in (
        ("identical_vectors", [0.5] * dim),
        ("zero_vectors", [0.0] * dim),
    ):
        d = tmp_path_factory.mktemp(f"sf_{kind}")
        for p in glob.glob("/root/testdata/sf0.001/*.parquet"):
            if not os.path.basename(p).startswith("embeddings"):
                shutil.copy(p, d / os.path.basename(p))
        rows = [
            (i, [float(v) for v in np.asarray(vec, dtype=np.float32)], i % 3)
            for i in range(30)
        ]
        spark.createDataFrame(
            rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
        ).coalesce(1).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
        out[kind] = str(d)
    return out


def test_doc_entries_survive_every_degenerate_shape(spark, degenerate_sfs):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    offenders = {}
    for kind, sf in degenerate_sfs.items():
        for name in DOC_ENTRIES:
            try:
                qs[name](spark, sf).count()
            except ValueError:
                continue  # descriptive clear-error path is acceptable
            except Exception as e:  # noqa: BLE001 — classifying raw errors
                offenders[(kind, name)] = (
                    f"{type(e).__name__}: {str(e).splitlines()[0][:140]}"
                )
    assert not offenders, offenders


def test_emb_entries_survive_degenerate_embeddings(spark, degenerate_emb_sfs):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    offenders = {}
    for kind, sf in degenerate_emb_sfs.items():
        for name in EMB_ENTRIES:
            try:
                qs[name](spark, sf).count()
            except ValueError:
                continue
            except Exception as e:  # noqa: BLE001
                offenders[(kind, name)] = (
                    f"{type(e).__name__}: {str(e).splitlines()[0][:140]}"
                )
    assert not offenders, offenders


def test_planted_expectations_single_doc(spark, degenerate_sfs):
    """One document: no pair operator may invent a pair."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    sf = degenerate_sfs["single_doc"]
    assert qs["dedup_exact"](spark, sf).count() == 1
    assert qs["minhash_neardup"](spark, sf).count() == 0
    assert qs["setsim_selfjoin"](spark, sf).count() == 0
    assert qs["dup_clusters"](spark, sf).count() == 0  # no edges, no nodes


def test_planted_expectations_all_identical(spark, degenerate_sfs):
    """50 byte-identical docs: exact dedup keeps ONE; MinHash emits every
    pair at jaccard exactly 1.0; the dup graph is one 50-node component."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    sf = degenerate_sfs["all_identical"]
    assert qs["dedup_exact"](spark, sf).count() == 1
    pairs = qs["minhash_neardup"](spark, sf).collect()
    assert len(pairs) == 50 * 49 // 2
    assert all(r.jaccard_sim == 1.0 for r in pairs)
    cc = qs["dup_clusters"](spark, sf).collect()
    assert len(cc) == 50
    comp_col = [c for c in cc[0].asDict() if c != "node"][0]
    assert len({r[comp_col] for r in cc}) == 1


def test_planted_expectations_one_char(spark, degenerate_sfs):
    """30 one-character docs cycling a/b/c: the shingle window exceeds the
    text (the greatest() guard path); same-char docs are byte-identical so
    exact dedup keeps 3 and MinHash pairs stay within the 3 groups."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    sf = degenerate_sfs["one_char"]
    assert qs["dedup_exact"](spark, sf).count() == 3
    pairs = qs["minhash_neardup"](spark, sf).collect()
    assert len(pairs) == 3 * (10 * 9 // 2)
    assert all(r.jaccard_sim == 1.0 for r in pairs)
    # docs 0..29 cycle a,b,c: a pair's members must be congruent mod 3
    assert all(r.id_a % 3 == r.id_b % 3 for r in pairs)


def test_planted_expectations_vocab_of_one(spark, degenerate_sfs):
    """One-word vocabulary: every idf/ngram statistic collapses but
    nothing may divide by zero; distinct lengths stay distinct docs and
    BM25 retrieval simply matches nothing (the query terms don't exist)."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    sf = degenerate_sfs["vocab_of_one"]
    assert qs["dedup_exact"](spark, sf).count() == 40
    bm = qs["bm25_retrieval"](spark, sf).collect()
    assert all(False for _ in bm) or all(r is not None for r in bm)
    # long repeats of the same word ARE near-duplicates of each other:
    # the pair set must be symmetric-sane (no self pairs, no dups)
    pairs = qs["minhash_neardup"](spark, sf).collect()
    seen = {(r.id_a, r.id_b) for r in pairs}
    assert len(seen) == len(pairs)
    assert all(r.id_a < r.id_b for r in pairs)


def test_planted_expectations_unicode(spark, degenerate_sfs):
    """Multibyte corpus: n_chars is CHARACTER count (so Spark/DuckDB
    substr semantics agree through the shingle paths), the 4-member
    unicode families are found as near-dups without raw errors, and
    exact dedup keeps all distinct texts."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    sf = degenerate_sfs["unicode"]
    docs = spark.read.parquet(sf + "/documents.parquet").collect()
    for r in docs:
        assert r.n_chars == len(r.text)  # codepoints, not bytes
        assert len(r.text.encode("utf-8")) > len(r.text)  # really multibyte
    assert qs["dedup_exact"](spark, sf).count() == 24
    pairs = qs["minhash_neardup"](spark, sf).collect()
    # family members share 12 of 13 words: pairs stay within families
    assert len(pairs) > 0
    assert all(r.id_a // 4 == r.id_b // 4 for r in pairs)
    # fingerprinting paths run clean over multibyte graphemes
    assert qs["winnow_fingerprints"](spark, sf).count() > 0
    assert qs["token_stats"](spark, sf).count() > 0
