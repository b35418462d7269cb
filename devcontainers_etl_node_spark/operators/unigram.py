"""Unigram-LM subword tokenizer training (Kudo, ACL 2018 — the
SentencePiece `unigram` model): the second production tokenizer family
next to BPE (`operators/text.py`).  Where BPE grows a vocabulary bottom-up
by merging, unigram starts from a LARGE seed vocabulary of candidate
pieces and shrinks it, fitting piece probabilities by EM over the
segmentation lattice and pruning the least-useful pieces each round.

Distributed shape (same contract as the BPE trainer):

- the corpus collapses ONCE into the weighted word-frequency table
  (`text.word_freq_table` — the only corpus-sized pass; Heaps' law makes
  everything after sublinear in corpus size);
- the seed vocabulary is one substring-explode + count over that table,
  top-``seed_size`` collected to the driver (bounded by the knob — the
  trained-artifact size, same class as IVF centroids / BPE merges);
- each EM iteration is ONE Arrow pass over the word table: a
  forward-backward over each word's segmentation lattice (piece probs
  ride the UDF closure) emitting per-(word, piece) expected-count
  contributions, aggregated by Spark.  Contributions are rounded to a
  fixed scale and summed as DECIMAL, so the cross-partition sum is exact
  and order-independent — the EM trajectory is bit-reproducible on any
  cluster layout (the module-docstring decimal trick from
  queries/catalog.py applied to floats we generate ourselves);
- the M-step and pruning are driver-side arithmetic over the
  vocab-sized count list: renormalize, then drop the lowest-expected-
  count pieces (never single characters — coverage must stay total)
  until ``shrink`` of the previous round survives, stopping at
  ``vocab_size``.

Pruning by expected count is the standard reimplementation
simplification of the paper's exact leave-one-out likelihood loss (the
loss ranking and the count ranking agree except near ties — both keep
every piece the lattice actually uses); the parity test pins this exact
rule, and EM monotonicity (corpus log-likelihood non-decreasing between
prunes) is gated in tests/test_unigram.py.

Encoding is Viterbi (max-probability segmentation) with the trained
piece log-probs in ONE map-only Arrow pass — linear scan, no shuffle,
parallel with input splits; unknown characters fall back to a floor
log-prob so encoding is total.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from devcontainers_etl_node_spark.operators.text import word_freq_table

# fixed rounding scale for per-(word, piece) EM contributions: coarse
# enough that float noise below it never flips a prune tie, fine enough
# that counts stay informative
_SCALE = 9
_UNK_LOGP = -1e2  # per-char floor for characters outside the vocabulary


def seed_vocab(wf: DataFrame, seed_size: int = 512, max_piece_len: int = 4) -> list[str]:
    """Candidate pieces: every substring of length 1..max_piece_len of the
    vocabulary words, weighted by word frequency; top ``seed_size`` by
    (weighted count desc, piece asc) UNION all single characters (without
    total character coverage some word would be unsegmentable).  One
    vocab-sized explode + count shuffle; the collect is ``seed_size`` +
    alphabet rows."""
    pieces = (
        wf.select(
            "n",
            F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i"),
            F.col("word"),
        )
        .select(
            "n",
            F.explode(F.sequence(F.lit(1), F.least(F.lit(max_piece_len), F.length("word") - F.col("i") + 1))).alias("l"),
            F.col("word"),
            F.col("i"),
        )
        .select(F.col("word").substr(F.col("i"), F.col("l")).alias("piece"), "n")
        .groupBy("piece")
        .agg(F.sum("n").cast("long").alias("c"))
    )
    top = (
        pieces.orderBy(F.col("c").desc(), F.col("piece").asc())
        .limit(seed_size)
        .collect()
    )
    chars = (
        pieces.filter(F.length("piece") == 1).select("piece").collect()
    )
    out = {r.piece for r in top} | {r.piece for r in chars}
    return sorted(out)


def _forward_backward(word: str, logp: dict[str, float], max_len: int) -> tuple[dict[str, float], float]:
    """Expected piece counts and log-likelihood of one word under the
    current model — pure per-word float math in a fixed order, so each
    word's contribution is deterministic regardless of batch layout."""
    n = len(word)
    NEG = float("-inf")
    fwd = [NEG] * (n + 1)
    fwd[0] = 0.0
    edges: list[list[tuple[int, str, float]]] = [[] for _ in range(n + 1)]
    for end in range(1, n + 1):
        for start in range(max(0, end - max_len), end):
            piece = word[start:end]
            lp = logp.get(piece)
            if lp is None:
                if end - start == 1:
                    lp = _UNK_LOGP  # coverage fallback
                else:
                    continue
            edges[end].append((start, piece, lp))
            cand = fwd[start] + lp
            if fwd[end] == NEG:
                fwd[end] = cand
            else:
                m = max(fwd[end], cand)
                fwd[end] = m + math.log(math.exp(fwd[end] - m) + math.exp(cand - m))
    bwd = [NEG] * (n + 1)
    bwd[n] = 0.0
    for end in range(n, 0, -1):
        if bwd[end] == NEG:
            continue
        for start, piece, lp in edges[end]:
            cand = bwd[end] + lp
            if bwd[start] == NEG:
                bwd[start] = cand
            else:
                m = max(bwd[start], cand)
                bwd[start] = m + math.log(math.exp(bwd[start] - m) + math.exp(cand - m))
    z = fwd[n]
    counts: dict[str, float] = {}
    if z == NEG:
        return counts, 0.0
    for end in range(1, n + 1):
        for start, piece, lp in edges[end]:
            if fwd[start] == NEG or bwd[end] == NEG:
                continue
            post = math.exp(fwd[start] + lp + bwd[end] - z)
            counts[piece] = counts.get(piece, 0.0) + post
    return counts, z


def _e_step(wf: DataFrame, logp: dict[str, float], max_len: int) -> list[tuple[str, float]]:
    """One EM expectation pass: per-(word, piece) contributions rounded to
    ``_SCALE`` decimals, decimal-summed by Spark (exact, order-free),
    collected as the vocab-sized count list."""
    bound = dict(logp)

    def _counts(batches):
        for pdf in batches:
            p_out, c_out = [], []
            for word, n in zip(pdf["word"], pdf["n"]):
                counts, _ = _forward_backward(word, bound, max_len)
                for piece, c in counts.items():
                    p_out.append(piece)
                    c_out.append(round(float(n) * c, _SCALE))
            yield pd.DataFrame({"piece": p_out, "c": c_out})

    rows = (
        wf.mapInPandas(_counts, "piece string, c double")
        .groupBy("piece")
        .agg(F.sum(F.col("c").cast(f"decimal(28,{_SCALE})")).alias("e"))
        .collect()
    )
    return [(r.piece, float(r.e)) for r in rows]


def corpus_loglik(wf: DataFrame, logp: dict[str, float], max_len: int) -> float:
    """Total corpus log-likelihood under the model (decimal-summed the
    same way as the E-step, so it is run-to-run exact) — the EM
    monotonicity gate's measurement."""
    bound = dict(logp)

    def _ll(batches):
        for pdf in batches:
            out = []
            for word, n in zip(pdf["word"], pdf["n"]):
                _, z = _forward_backward(word, bound, max_len)
                out.append(round(float(n) * z, _SCALE))
            yield pd.DataFrame({"ll": out})

    row = (
        wf.mapInPandas(_ll, "ll double")
        .agg(F.sum(F.col("ll").cast(f"decimal(28,{_SCALE})")).alias("t"))
        .collect()[0]
    )
    return float(row.t)


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 200,
    seed_size: int = 512,
    max_piece_len: int = 4,
    em_iters_per_round: int = 2,
    shrink: float = 0.75,
) -> list[tuple[str, float]]:
    """Train the unigram LM: seed → (EM × ``em_iters_per_round`` → prune
    to ``shrink`` of survivors) until ``vocab_size``.  Returns the
    trained [(piece, prob), ...] sorted by (prob desc, piece asc) —
    driver-tiny, the artifact handed to ``unigram_viterbi_encode``."""
    wf = word_freq_table(df, text_col).localCheckpoint(eager=True)
    vocab = seed_vocab(wf, seed_size, max_piece_len)
    probs = {p: 1.0 / len(vocab) for p in vocab}

    while True:
        for _ in range(em_iters_per_round):
            logp = {p: math.log(v) for p, v in probs.items()}
            counts = dict(_e_step(wf, logp, max_piece_len))
            total = sum(counts.get(p, 0.0) for p in probs)
            if total <= 0:
                raise ValueError(
                    "unigram_train: total expected count is 0 — the corpus "
                    "has no words of length >= 2 (word_freq_table filters "
                    "shorter words), so there is nothing to train on"
                )
            probs = {
                p: counts.get(p, 0.0) / total for p in probs if counts.get(p, 0.0) > 0 or len(p) == 1
            }
            # pieces the lattice never used drop out of the model at
            # renormalization (prob 0 would poison log) — chars persist
            # with a floor so coverage stays total
            floor = 1.0 / (total * 1e6)
            probs = {p: (v if v > 0 else floor) for p, v in probs.items()}
        if len(probs) <= vocab_size:
            break
        multi = sorted(
            ((p, v) for p, v in probs.items() if len(p) > 1),
            key=lambda kv: (kv[1], kv[0]),
        )
        n_chars = len(probs) - len(multi)
        keep_multi = max(vocab_size - n_chars, int(len(multi) * shrink))
        if keep_multi >= len(multi):
            break
        dropped = multi[: len(multi) - keep_multi]
        for p, _ in dropped:
            del probs[p]
        total = sum(probs.values())
        probs = {p: v / total for p, v in probs.items()}

    return sorted(probs.items(), key=lambda kv: (-kv[1], kv[0]))


def viterbi_segment(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Max-probability segmentation — deterministic tiebreak: on equal
    score prefer the LONGER last piece (then lexicographic), matching the
    pure-Python reference in the parity test."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    best[0] = 0.0
    for end in range(1, n + 1):
        for start in range(max(0, end - max_len), end):
            piece = word[start:end]
            lp = logp.get(piece)
            if lp is None:
                if end - start == 1:
                    lp = _UNK_LOGP
                else:
                    continue
            if best[start] == NEG:
                continue
            cand = best[start] + lp
            prev = back[end]
            if (
                cand > best[end]
                or (cand == best[end] and prev is not None and (end - start, piece) > (end - prev[0], prev[1]))
            ):
                best[end] = cand
                back[end] = (start, piece)
    pieces: list[str] = []
    pos = n
    while pos > 0:
        start, piece = back[pos]
        pieces.append(piece)
        pos = start
    return pieces[::-1]


def unigram_viterbi_encode(
    df: DataFrame,
    model: list[tuple[str, float]],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 4,
) -> DataFrame:
    """Encode text with the trained unigram model in ONE map-only Arrow
    pass (the model is driver-tiny and rides the UDF closure — same
    100 TB contract as ``bpe_encode``: a linear scan that parallelizes
    with input splits, no shuffle).  Returns
    (id_col, pieces: array<string>, n_pieces)."""
    from pyspark.sql.functions import pandas_udf

    logp = {p: math.log(v) for p, v in model}

    @pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            pieces: list[str] = []
            for w in (t or "").strip().lower().split():
                pieces.extend(viterbi_segment(w, logp, max_piece_len))
            out.append(pieces)
        return pd.Series(out)

    return df.select(
        F.col(id_col),
        _encode(F.col(text_col)).alias("pieces"),
    ).withColumn("n_pieces", F.size("pieces").cast("long"))
