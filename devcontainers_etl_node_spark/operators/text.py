"""Text analysis operators for large-scale training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen) — no Python
UDFs in any hot path. Every operator is a narrow map over the documents
table: no shuffle, scales linearly with input splits at 100 TB. The
Arrow UDFs are BPE's (merge TRAINING runs over the aggregated
word-frequency vocabulary — never the corpus — and merge ENCODING, by
nature a corpus map) plus zlib compression_ratio (stdlib DEFLATE has no
Column equivalent); each is one vectorized Arrow pass, still shuffle-free.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

# Tiny multilingual stopword lists for the n-gram/stopword language-ID
# heuristic and quality scoring. Deliberately small: the point is the
# operator shape (scored argmax over language evidence), not lexicon size.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "los"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "ein"],
    "fr": ["le", "la", "de", "et", "est", "un", "une", "les", "des", "en"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "这", "人"],
}

ENGLISH_STOPWORDS = STOPWORDS["en"]

# BPE-ish token regex: word pieces, numbers, or single non-space symbols —
# a deterministic public-knowledge approximation of subword tokenizers.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; empty string → empty array."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Count of TOKEN_REGEX matches — a subword-ish token estimate."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), F.lit(0)))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of whitespace tokens that are stopwords (0.0 if no tokens)."""
    sw = F.array(*[F.lit(w) for w in (stopwords or ENGLISH_STOPWORDS)])
    toks = tokens(col)
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return F.when(n > 0, n_stop.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(F.regexp_replace(c, r"[^\.,;:!\?]", ""))
    return F.when(F.length(c) > 0, n_punct.cast("double") / F.length(c).cast("double")).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Heuristic document-quality score in [0,1]: rewards mid-length docs,
    healthy stopword density, low punctuation noise. The shape mirrors
    public quality-filter pipelines (C4/Gopher-style rules)."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.25))
    sw = stopword_ratio(c)
    sw_ok = F.when((sw >= 0.01) & (sw <= 0.6), F.lit(1.0)).otherwise(F.lit(0.5))
    pr_ok = F.when(punct_ratio(c) <= 0.2, F.lit(1.0)).otherwise(F.lit(0.5))
    return (len_ok * sw_ok * pr_ok).alias("quality_score")


def lang_id(col: Column | str) -> Column:
    """Stopword-evidence language ID: argmax over per-language stopword hit
    counts; 'und' when no evidence. Pure expressions → codegen'd."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.transform(tokens(c), lambda t: F.lower(t))
    scores = []
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(col: Column | str) -> Column:
    """Deterministic 64-bit document fingerprint (xxhash64 of normalized
    text) — the rolling-hash-style content fingerprint for shard-level
    exact dedup at scale."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    return F.xxhash64(normalized)


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Full per-document text-analysis profile in one map-side pass."""
    c = F.col(text_col)
    return df.select(
        *df.columns,
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_subword_tokens"),
        F.length(c).alias("n_chars_computed"),
        stopword_ratio(c).alias("stopword_ratio"),
        punct_ratio(c).alias("punct_ratio"),
        quality_score(c).alias("quality_score"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )


def phonetic_blocking(
    df: DataFrame,
    name_col: str = "p_name",
    id_col: str = "p_partkey",
    max_dist: int = 4,
    max_block: int = 1000,
) -> DataFrame:
    """Entity-resolution candidate pairs via phonetic (Soundex) blocking.

    The classic record-linkage shape (reference has no equivalent; this
    is an engine addition for large-scale entity dedup): rather than an
    O(n²) all-pairs fuzzy match, records are BLOCKED by the Soundex code
    of the last word of the name (the head noun for adjective-noun
    names), the self-join runs only within a block, and surviving pairs
    are verified with an exact Levenshtein distance. Both soundex() and
    levenshtein() are JVM built-ins — whole-stage codegen, no Python.

    Scale: the only shuffle keys on the (4-char) block code. Block skew
    is the known failure mode (a mega-block of phonetically identical
    names goes quadratic), so blocks larger than ``max_block`` members
    are dropped with the same rationale as LSH band caps — a block that
    big has no discriminating power anyway; the cap is a count-window,
    not a collect. Pairs are ordered (id_a < id_b) and verified exact,
    so output is deterministic.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        F.lower(F.trim(F.col(name_col))).alias("_nm"),
    ).withColumn("_blk", F.soundex(F.element_at(F.split(F.col("_nm"), r"\s+"), -1)))
    counts = base.groupBy("_blk").agg(F.count(F.lit(1)).alias("_bn"))
    bounded = base.join(counts.filter(F.col("_bn") <= max_block), "_blk", "left_semi")
    a, b = bounded.alias("a"), bounded.alias("b")
    return (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk")) & (F.col("a._id") < F.col("b._id")),
        )
        .withColumn("lev_dist", F.levenshtein(F.col("a._nm"), F.col("b._nm")))
        .filter(F.col("lev_dist") <= max_dist)
        .select(
            F.col("a._blk").alias("block_key"),
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("lev_dist").cast("int").alias("lev_dist"),
        )
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich et al., ACL 2016)
# ---------------------------------------------------------------------------


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) — the weighted vocabulary BPE trains over.

    This is the ONLY corpus-sized pass of BPE training: one whitespace
    explode + one count shuffle on the word. Everything after operates on
    the aggregated vocabulary (sublinear in corpus size — Heaps' law), so
    at 100 TB the merge loop never touches raw text again."""
    return (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_pair_count_table(wf: DataFrame) -> DataFrame:
    """(left_sym, right_sym, pair_count) over single characters: the
    iteration-0 BPE pair statistic, weighted by word frequency. Pure
    Column explode + sum — the exact aggregation each merge iteration
    repeats over the evolving symbol sequences."""
    pairs = wf.select(
        "n",
        F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i"),
        F.col("word"),
    ).select(
        F.col("word").substr(F.col("i"), F.lit(1)).alias("left_sym"),
        F.col("word").substr(F.col("i") + 1, F.lit(1)).alias("right_sym"),
        "n",
    )
    return pairs.groupBy("left_sym", "right_sym").agg(
        F.sum("n").cast("long").alias("pair_count")
    )


def _merge_udf(pairs: list[tuple[str, str]]):
    """Arrow UDF applying a list of BPE merges to symbol arrays, each as a
    greedy left-to-right pass, in order. Built by a FACTORY so the merge
    pairs are bound at definition time — correctness does not depend on
    the caller's evaluation timing (a closure over loop variables would
    silently apply the last pair at every rank under lazy evaluation)."""
    from pyspark.sql.functions import pandas_udf

    bound = list(pairs)

    @pandas_udf("array<string>")
    def _apply(col: pd.Series) -> pd.Series:
        out = []
        for s in col:
            s = list(s)
            for left, right in bound:
                merged, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                        merged.append(left + right)
                        i += 2
                    else:
                        merged.append(s[i])
                        i += 1
                s = merged
            out.append(s)
        return pd.Series(out)

    return _apply


def bpe_train_merges(
    df: DataFrame, text_col: str = "text", n_merges: int = 8, end_of_word: str = "</w>"
) -> list[tuple[int, str, str, int]]:
    """Byte-pair-encoding merge training (Sennrich et al., ACL 2016):
    learn `n_merges` merges over the corpus, most-frequent-pair first.

    Returns [(rank, left, right, freq), ...] — driver-tiny (n_merges
    rows), like any trained-artifact handoff (cf. train_ivf_centroids).

    Distributed shape: the corpus collapses ONCE into the weighted
    word-frequency table (`word_freq_table` — the only corpus-sized
    pass); each merge iteration then runs (a) a pair-count aggregation
    over the exploded symbol sequences of the VOCABULARY (sublinear in
    corpus size), (b) a 1-row argmax to the driver (the merge decision —
    deterministic tiebreak: freq desc, left asc, right asc), and (c) a
    map-only Arrow pass applying the merge left-to-right greedily to
    each word's symbol array. The evolving vocab table is
    localCheckpoint'ed per iteration so the iterative lineage stays
    bounded (the same discipline as dup_bfs/star-contraction). Words
    carry an end-of-word marker on the final symbol, per the paper, so
    suffix units ("ing</w>") stay distinct from infix ones.

    At 100 TB: the word explode + count is one shuffle over the corpus;
    the loop's per-iteration cost is vocabulary-sized (hundreds of
    millions of rows for web-scale text — still a distributed table, NOT
    a driver collect), and n_merges passes over it. Production trainers
    cap vocab (frequency floor) and run ~30k merges over a sampled
    corpus; both knobs compose here (filter wf, raise n_merges); see
    ``bpe_train_merges_batched`` for the merges-per-job optimization."""
    vocab = _marked_vocab(df, text_col, end_of_word).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            _sym_pair_counts(vocab)
            .orderBy(F.col("freq").desc(), F.col("left").asc(), F.col("right").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, freq = top[0].left, top[0].right, top[0].freq

        nxt = vocab.select(
            _merge_udf([(left, right)])("syms").alias("syms"), "n"
        ).localCheckpoint(eager=True)
        vocab = nxt
        merges.append((rank, left, right, int(freq)))
    return merges


def _sym_pair_counts(vocab: DataFrame) -> DataFrame:
    """(left, right, freq) over adjacent symbol pairs of the evolving
    vocabulary, weighted by word frequency — the per-iteration BPE
    statistic. Fully-merged single-symbol words contribute no pairs (and
    sequence(1, 0) would DESCEND, indexing past the array)."""
    return (
        vocab.filter(F.size("syms") >= 2)
        .select(
            "n",
            F.explode(F.sequence(F.lit(1), F.size("syms") - 1)).alias("i"),
            F.col("syms"),
        )
        .select(
            F.element_at("syms", F.col("i")).alias("left"),
            F.element_at("syms", F.col("i") + 1).alias("right"),
            "n",
        )
        .groupBy("left", "right")
        .agg(F.sum("n").cast("long").alias("freq"))
    )


def _marked_vocab(df: DataFrame, text_col: str, end_of_word: str) -> DataFrame:
    """(syms: array<string>, n) — the word-frequency table split to chars
    with the end-of-word marker on the final symbol (Sennrich fig. 2)."""
    wf = word_freq_table(df, text_col)
    chars = F.split(F.col("word"), "")
    marked = F.concat(
        F.slice(chars, 1, F.size(chars) - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit(end_of_word))),
    )
    return wf.select(marked.alias("syms"), "n")


def select_disjoint_pairs(
    candidates: list[tuple[str, str, int]], batch_size: int
) -> list[tuple[str, str, int]]:
    """Greedy selection of up to ``batch_size`` symbol-disjoint pairs from
    a (freq desc, left, right)-sorted candidate list — the batched-BPE
    merge-selection rule. Two merges are CONFLICT-FREE when their symbol
    sets are disjoint: applying (a,b) can only destroy adjacencies that
    touch a or b and only create adjacencies that touch the new symbol
    ab, so the counts of every disjoint pair are invariant under it —
    the batch applies in rank order with each pair's selection-time
    frequency still exact. Pure driver-side logic over a bounded
    candidate window; exported so the parity test's pure-Python
    reference can share the exact rule."""
    selected: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for left, right, freq in candidates:
        if len(selected) == batch_size:
            break
        if left in used or right in used:
            continue
        selected.append((left, right, freq))
        used.add(left)
        used.add(right)
    return selected


def bpe_train_merges_batched(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 64,
    batch_size: int = 8,
    vocab_size: int | None = None,
    end_of_word: str = "</w>",
) -> list[tuple[int, str, str, int]]:
    """Batched BPE training — the production-shape trainer: per round,
    ONE pair-count aggregation selects up to ``batch_size``
    symbol-disjoint merges (see ``select_disjoint_pairs``) and ONE Arrow
    pass applies them all, so Spark jobs grow as n_merges / batch_size
    instead of n_merges (the standard fast-trainer optimization — a 30k
    merge production vocabulary becomes ~4k rounds at batch_size=8, not
    30k sequential jobs; cf. the sequential trainer's honest caveat).

    Algorithm contract (what the parity test pins): each round sorts all
    pairs by (freq desc, left, right), takes the first
    ``batch_size * 8`` as the candidate window (driver-tiny collect;
    window membership is part of the deterministic contract), greedily
    selects disjoint pairs, applies them in rank order. Disjointness
    makes each recorded frequency exact at its selection point; the
    batch as a whole is the documented approximation vs pure sequential
    BPE — a pair MATERIALIZED by merge k can't be selected until the
    next round, so batched and sequential merge lists can diverge after
    rank batch_size (both remain valid BPE vocabularies; this is the
    trade every batched trainer makes).

    Stopping: after ``n_merges`` merges, when a round finds no pairs, or
    when ``vocab_size`` (base alphabet + merge count, the standard vocab
    accounting) is reached. Returns [(rank, left, right, freq), ...]."""
    vocab = _marked_vocab(df, text_col, end_of_word).localCheckpoint(eager=True)
    if vocab_size is not None:
        # base alphabet: distinct single symbols of the initial vocab —
        # a one-row agg (alphabet-sized distinct, bounded by charset)
        n_alpha = (
            vocab.select(F.explode("syms").alias("s")).agg(
                F.countDistinct("s").alias("n")
            ).collect()[0].n
        )
        n_merges = min(n_merges, max(0, vocab_size - n_alpha))

    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges:
        m = min(batch_size, n_merges - len(merges))
        candidates = [
            (r.left, r.right, int(r.freq))
            for r in _sym_pair_counts(vocab)
            .orderBy(F.col("freq").desc(), F.col("left").asc(), F.col("right").asc())
            .limit(batch_size * 8)
            .collect()
        ]
        selected = select_disjoint_pairs(candidates, m)
        if not selected:
            break
        vocab = vocab.select(
            _merge_udf([(l, r) for l, r, _ in selected])("syms").alias("syms"), "n"
        ).localCheckpoint(eager=True)
        merges.extend(
            (len(merges) + j, l, r, f) for j, (l, r, f) in enumerate(selected)
        )
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    end_of_word: str = "</w>",
) -> DataFrame:
    """Encode text with a learned BPE merge table — the inference half of
    tokenizer support (`bpe_train_merges` is the training half).

    Applies the merges IN RANK ORDER with the same left-to-right greedy
    pass the trainer used, so a word seen in training reproduces its
    final training segmentation exactly (parity pinned in tests against
    the pure-Python reference). The merge table is driver-tiny
    (n_merges rows) and ships to executors inside the UDF closure — the
    corpus is encoded in ONE map-only Arrow pass, no shuffle, which is
    the whole 100 TB story: tokenization cost is a linear scan that
    parallelizes with input splits.

    Returns (id_col, subwords: array<string>, n_subwords)."""
    from pyspark.sql.functions import pandas_udf

    ordered = [(left, right) for _, left, right, _ in sorted(merges)]

    @pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            subs: list[str] = []
            for w in (t or "").strip().lower().split():
                # single-char words ('a', 'I', digits) carry no pairs so no
                # merge can ever apply — emit them directly as char+eow
                # rather than dropping them (the corpus must stay lossless
                # beyond subword splitting, even though training's vocab
                # filter skips them: they contribute no pair statistics)
                s = list(w)
                s[-1] = s[-1] + end_of_word
                for left, right in ordered:
                    merged, i = [], 0
                    while i < len(s):
                        if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                            merged.append(left + right)
                            i += 2
                        else:
                            merged.append(s[i])
                            i += 1
                    s = merged
                subs.extend(s)
            out.append(subs)
        return pd.Series(out)

    return df.select(
        F.col(id_col),
        _encode(F.col(text_col)).alias("subwords"),
    ).withColumn("n_subwords", F.size("subwords").cast("long"))


def winnow_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5, w: int = 4
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken SIGMOD'03,
    the MOSS scheme): hash every char-k-gram, slide a window of w
    consecutive hashes, keep each window's minimum (rightmost on ties).
    Guarantee: any substring shared between two docs of length >= w+k-1
    contributes an identical (gram_hash) fingerprint to both outputs.
    Output: (doc_id, pos, gram_hash) — density ~2/(w+1) of all grams.

    The sort key is md5(gram) || lpad(10^9-1-pos): fixed-width, so one
    string MIN encodes both min-hash and the rightmost-tie rule (repeated
    grams within a doc really do collide on md5) — and an identical SQL
    twin selects identical fingerprints (see catalog winnow_fingerprints).
    The window partitions by doc, so sorting is per-document, never global.
    """
    norm = df.select(
        F.col(id_col).alias("doc_id"),
        F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")).alias("t"),
    ).filter(F.length("t") >= k)
    # r14 (guide §8): satisfy the window's hashpartitioning(doc_id)
    # requirement BEFORE the per-character explode, so the one exchange
    # carries each doc ONCE (~1 byte/char) instead of one 41-byte sort
    # key per char (~50x the bytes). Generate preserves partitioning, so
    # the window adds no second exchange — only its per-partition sort,
    # which the shuffle previously paid anyway. The partition count is
    # EXPLICIT (the session's shuffle-partition knob — the same count the
    # pre-r14 exploded exchange used): a bare repartition("doc_id") is
    # AQE-coalesced by the tiny DOC bytes it can see, not the ~50x
    # post-explode volume it cannot, and the measured result was the
    # whole md5+window stage serialized onto ~3 tasks (5.4 s vs 0.95 s —
    # plans/r14 winnow experiment; output pinned identical). A map-side
    # array formulation (transform + least-of-w, zero exchanges) was
    # also measured and is a 12 s dead end: interpreted lambdas, no
    # codegen. Per-task post-explode volume scales exactly like the
    # pre-r14 plan's, so the cluster sizing story is unchanged.
    norm = norm.repartition(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions")), "doc_id"
    )
    pos = norm.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(1), F.length("t") - (k - 1))).alias("p"),
    )
    hashed = pos.select(
        "doc_id",
        "p",
        F.concat(
            F.md5(F.expr(f"substr(t, p, {k})").cast("binary")),
            F.lpad((F.lit(999999999) - F.col("p")).cast("string"), 9, "0"),
        ).alias("k"),
    )
    win = Window.partitionBy("doc_id").orderBy("p").rowsBetween(-(w - 1), 0)
    selected = (
        hashed.withColumn("sel", F.min("k").over(win))
        .filter(F.col("p") >= w)
        .select("doc_id", "sel")
        .distinct()
    )
    return selected.select(
        "doc_id",
        (F.lit(999999999) - F.substring("sel", 33, 9).cast("long")).cast("long").alias("pos"),
        F.substring("sel", 1, 32).alias("gram_hash"),
    )


def compression_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", level: int = 6
) -> DataFrame:
    """Per-document zlib compression ratio — the repetition/boilerplate
    quality signal public curation pipelines use alongside the Gopher
    rules (machine-generated and template text compresses far below
    natural prose; a ratio near 1 flags high-entropy noise like base64).

    Arrow-batched ``pandas_udf`` (zlib is stdlib; DEFLATE output is fully
    determined by input + level, so the signal is deterministic and
    re-runnable). Map-only: no shuffle at any scale — each task
    compresses its own partition's documents and emits 3 integers per
    doc; the text never moves.

    Output: (doc_id, raw_bytes, compressed_bytes, ratio_permille) with
    ratio_permille = 1000 * compressed/raw rounded to an integer (exact
    integer arithmetic — no cross-engine float surface).
    """
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _compressed_len(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), level)) if t is not None else None
        )

    raw = F.octet_length(F.col(text_col)).cast("long")
    comp = _compressed_len(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        raw.alias("raw_bytes"),
        comp.alias("compressed_bytes"),
        # guard raw == 0 (empty doc): ANSI mode makes x/0 an ERROR, not NULL
        F.when(raw > 0, F.round(F.lit(1000.0) * comp / raw).cast("long"))
        .otherwise(F.lit(None).cast("long"))
        .alias("ratio_permille"),
    )
