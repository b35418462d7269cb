"""Unigram-LM tokenizer (operators/unigram.py): the lattice math is
verified against BRUTE-FORCE enumeration of every segmentation (a truly
independent oracle — exponential, fine for test-sized words), EM is
gated on corpus log-likelihood monotonicity, and the trained model must
be deterministic, coverage-total, and actually compress vs characters."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from devcontainers_etl_node_spark.operators import unigram as ug

SF_SMALL = "/root/testdata/sf0.001"


def _brute_segmentations(word, vocab, max_len):
    """Every way to cut `word` into pieces of length <= max_len that are
    in-vocab (or single UNK chars), with each segmentation's log-prob."""
    n = len(word)
    out = []
    for cuts in itertools.product([0, 1], repeat=n - 1):
        bounds = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
        pieces = [word[a:b] for a, b in zip(bounds, bounds[1:])]
        lp = 0.0
        ok = True
        for p in pieces:
            if len(p) > max_len:
                ok = False
                break
            if p in vocab:
                lp += vocab[p]
            elif len(p) == 1:
                lp += ug._UNK_LOGP
            else:
                ok = False
                break
        if ok:
            out.append((pieces, lp))
    return out


def _logsumexp(vals):
    m = max(vals)
    return m + math.log(sum(math.exp(v - m) for v in vals))


@pytest.mark.parametrize("word", ["banana", "abcab", "zzzz", "qx"])
def test_forward_backward_matches_bruteforce(word):
    vocab = {
        "a": math.log(0.2), "b": math.log(0.1), "n": math.log(0.1),
        "c": math.log(0.05), "z": math.log(0.05), "an": math.log(0.15),
        "na": math.log(0.1), "ban": math.log(0.05), "ana": math.log(0.1),
        "zz": math.log(0.08), "ab": math.log(0.02),
    }
    segs = _brute_segmentations(word, vocab, max_len=3)
    z_brute = _logsumexp([lp for _, lp in segs])
    expected = {}
    for pieces, lp in segs:
        w = math.exp(lp - z_brute)
        for p in pieces:
            expected[p] = expected.get(p, 0.0) + w
    counts, z = ug._forward_backward(word, vocab, max_len=3)
    assert z == pytest.approx(z_brute, abs=1e-9)
    assert set(counts) == set(expected)
    for p in expected:
        assert counts[p] == pytest.approx(expected[p], abs=1e-9), p


@pytest.mark.parametrize("word", ["banana", "abcab", "zzzz", "qqq"])
def test_viterbi_reaches_bruteforce_best_score(word):
    vocab = {
        "a": math.log(0.2), "b": math.log(0.1), "n": math.log(0.1),
        "an": math.log(0.15), "ana": math.log(0.1), "zz": math.log(0.08),
    }
    segs = _brute_segmentations(word, vocab, max_len=3)
    best = max(lp for _, lp in segs)
    pieces = ug.viterbi_segment(word, vocab, max_len=3)
    got = sum(
        vocab.get(p, ug._UNK_LOGP if len(p) == 1 else float("-inf")) for p in pieces
    )
    assert "".join(pieces) == word
    assert got == pytest.approx(best, abs=1e-9)


def test_em_loglik_monotone_on_fixed_vocab(spark):
    """Classic EM guarantee, measured end-to-end through the distributed
    E-step: each (E, M) pair must not decrease corpus log-likelihood."""
    from devcontainers_etl_node_spark.catalog import table

    docs = table(spark, SF_SMALL, "documents").limit(120)
    wf = ug.word_freq_table(docs).localCheckpoint(eager=True)
    vocab = ug.seed_vocab(wf, seed_size=200, max_piece_len=4)
    probs = {p: 1.0 / len(vocab) for p in vocab}
    lls = []
    for _ in range(3):
        logp = {p: math.log(v) for p, v in probs.items()}
        lls.append(ug.corpus_loglik(wf, logp, 4))
        counts = dict(ug._e_step(wf, logp, 4))
        total = sum(counts.get(p, 0.0) for p in probs)
        probs = {p: counts[p] / total for p in probs if counts.get(p, 0.0) > 0}
    assert lls == sorted(lls), lls
    assert lls[-1] > lls[0]  # and it actually moved


def test_train_is_deterministic_and_bounded(spark):
    from devcontainers_etl_node_spark.catalog import table

    docs = table(spark, SF_SMALL, "documents").limit(150)
    kw = dict(vocab_size=120, seed_size=240, max_piece_len=4)
    m1 = ug.unigram_train(docs, **kw)
    m2 = ug.unigram_train(docs, **kw)
    assert m1 == m2  # decimal-summed E-step → bit-reproducible
    n_chars = sum(1 for p, _ in m1 if len(p) == 1)
    assert len(m1) <= max(120, n_chars)
    assert all(v > 0 for _, v in m1)


def test_encode_exhaustive_parity_on_planted_corpus(spark):
    """Whole-corpus segmentation parity (r7 verdict #6): train on a
    planted corpus, then verify the distributed encode for EVERY word —
    not a sample — against the brute-force enumerator: the emitted
    segmentation must rebuild the word, reach the brute-force MAX score
    under the trained model, equal the unique argmax wherever the argmax
    is unique, and equal the pure-Python Viterbi (documented tiebreak)
    everywhere.  Closes the gap between 'lattice math verified' and
    'whole-corpus segmentation verified'."""
    words = [
        "banana", "bananana", "nanana", "anan", "ban", "nab", "abab",
        "baba", "zzzz", "zzab", "cab", "qab", "anabanz", "zanzan",
        "cabana", "bancab", "qq", "a", "zb", "naban",
    ]
    # frequency-weighted training corpus: early words dominate so the
    # trained vocab prefers banana-family pieces
    rows = []
    did = 0
    for i, w in enumerate(words):
        for _ in range(max(1, 12 - i)):
            rows.append((did, w))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = ug.unigram_train(
        docs, vocab_size=30, seed_size=80, max_piece_len=3
    )
    logp = {p: math.log(v) for p, v in model}

    probe = spark.createDataFrame(
        list(enumerate(words)), "doc_id long, text string"
    )
    enc = {
        r["doc_id"]: list(r["pieces"])
        for r in ug.unigram_viterbi_encode(probe, model, max_piece_len=3).collect()
    }
    for i, w in enumerate(words):
        got = enc[i]
        assert "".join(got) == w, (w, got)
        got_lp = sum(
            logp.get(p, ug._UNK_LOGP if len(p) == 1 else float("-inf"))
            for p in got
        )
        segs = _brute_segmentations(w, logp, max_len=3)
        best = max(lp for _, lp in segs)
        assert got_lp == pytest.approx(best, abs=1e-9), (w, got)
        top = [pieces for pieces, lp in segs if abs(lp - best) < 1e-9]
        if len(top) == 1:
            assert got == top[0], (w, got, top[0])
        # distributed pass == pure-Python Viterbi, tiebreak included
        assert got == ug.viterbi_segment(w, logp, 3), w


def test_train_raises_clearly_on_empty_word_table(spark):
    """r7 ADVICE: an all-short-word corpus (word_freq_table keeps only
    len >= 2) must raise a descriptive error, not ZeroDivisionError."""
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "x y"), (2, "")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="nothing to train"):
        ug.unigram_train(docs, vocab_size=10, seed_size=20, max_piece_len=3)


def test_encode_is_lossless_and_compresses(spark):
    from devcontainers_etl_node_spark.catalog import table

    docs = table(spark, SF_SMALL, "documents").limit(150)
    model = ug.unigram_train(docs, vocab_size=120, seed_size=240, max_piece_len=4)
    enc = ug.unigram_viterbi_encode(docs, model, max_piece_len=4)
    joined = enc.join(docs.select("doc_id", "text"), "doc_id")
    rows = joined.select(
        F.concat_ws("", "pieces").alias("rebuilt"),
        F.regexp_replace(F.lower(F.trim("text")), r"\s+", "").alias("flat"),
        "n_pieces",
        F.length(F.regexp_replace(F.lower(F.trim("text")), r"\s+", "")).alias("n_chars"),
    ).collect()
    assert all(r.rebuilt == r.flat for r in rows)  # nothing lost or invented
    total_pieces = sum(r.n_pieces for r in rows)
    total_chars = sum(r.n_chars for r in rows)
    assert total_pieces < 0.8 * total_chars  # trained pieces beat chars
