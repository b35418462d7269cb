"""Full-text retrieval + exact set-similarity join over the document corpus.

Two scale-path operators the reference pipeline family lacks entirely
(the reference is an eager single-process pandas ETL — reference
src/etl/etl.py has no text retrieval at all); both are core tools of a
large-scale training-data curation stack:

- **BM25 top-k retrieval** (`bm25_topk`): build an inverted index
  (postings = per-(doc, term) frequencies), score a bounded query set
  against it, return the top-k docs per query. At 100 TB the corpus is
  tokenized exactly once into postings (map-side partial agg before the
  one (doc_id, term) shuffle), the query set is broadcast, and only
  postings matching a query term survive past the join — scoring work is
  proportional to matching postings, never to the corpus. This is how
  benchmark-contamination checks and "find training docs similar to this
  eval item" audits run at scale.

- **Prefix-filtered exact Jaccard self-join** (`setsim_join_prefix`):
  the AllPairs/PPJoin family (Bayardo et al. WWW'07; Xiao et al.
  WWW'08; Vernica, Carey, Li SIGMOD'10 for the MapReduce formulation —
  all public literature). Unlike MinHash LSH (operators/dedup.py),
  which is approximate, this finds EVERY pair with Jaccard >= t, but
  without the O(n²) block cross-product `ngram_jaccard` uses: each
  doc's shingle set is sorted by ascending global document frequency
  (rarest first) and only a provably-sufficient PREFIX of length
  |s| - ceil(t*|s|) + 1 is emitted as candidate-generation keys. Two
  sets with J >= t must share a prefix token under the common global
  order, so the equi-join on prefix tokens is a complete candidate set;
  an exact intersection count then verifies each candidate. At 100 TB
  the join key space is the rare end of the shingle vocabulary —
  candidate volume tracks true-pair volume, not corpus-pairs volume.

Cross-engine exactness (the DuckDB-oracle contract): BM25's classic idf
uses ln(), and transcendentals are NOT bit-identical between libm and
the JVM — so scoring uses the log-free odds form
(N - df + 0.5)/(df + 0.5) (the argument of BM25's ln, monotone in it,
rank-equivalent per term). Every arithmetic op in the score is IEEE
+,-,*,/ (correctly rounded, hence bit-identical across engines given
the same association order, which the catalog oracle mirrors), and the
per-term score is fixed-pointed to integer MICROS before the per-(query,
doc) sum so float summation order cannot skew the total.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from devcontainers_etl_node_spark.operators.dedup import word_shingles

# ---------------------------------------------------------------------------
# Inverted index + BM25
# ---------------------------------------------------------------------------


def postings(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Inverted-index postings: one row per (doc, term) with the term
    frequency. Whitespace tokenization, lowercased — the same convention
    every text entry in the catalog uses. The groupBy partial-aggregates
    map-side, so the one shuffle moves (id, term, tf) rows — never the
    raw text."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("term"),
    )
    return toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).cast("long").alias("tf"))


def bm25_topk(
    df: DataFrame,
    query_terms: list[tuple[int, list[str]]],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k docs per query under log-free BM25.

    Per matching (query, doc, term):

        idf_odds = (N - df + 0.5) / (df + 0.5)          -- BM25 idf sans ln
        tfn      = (tf * (k1+1)) / (tf + k1 * ((1-b) + b * (dl / avgdl)))
        micros   = CAST(ROUND(idf_odds * tfn * 1e6) AS LONG)

    summed per (query, doc) and ranked (score desc, doc_id asc). The
    integer-micros fixed point makes the sum order-insensitive and the
    result hashable against a SQL oracle bit-for-bit.

    Plan shape (r14 rework — the pre-r14 form built full-corpus postings
    FOUR times: the physical plan scanned + exploded + aggregated the
    whole corpus once each for dl, corpus stats, df and the matched
    postings, with two corpus-sized exchanges; guide §2.3/§2.4):

    - doc length is computed MAP-SIDE as ``size(split(text))`` — by
      definition equal to ``SUM(tf)`` over the doc's postings — and rides
      the same tokenize pass as the postings, so the full-postings
      ``groupBy(doc_id)`` shuffle disappears;
    - the query vocabulary is a literal ``isin`` filter applied to the
      exploded tokens BEFORE the postings aggregation (identical to the
      former inner-join against the distinct query terms), so the one
      postings exchange carries only query-term rows at any corpus size;
    - corpus stats (N, avgdl) are a one-row map-side aggregate over the
      docs (no postings needed).

    Two corpus tokenize passes total (matched postings + stats), zero
    corpus-sized exchanges; df per term still counts the FULL corpus's
    matching postings (the filter precedes the per-(doc,term) groupBy,
    not the df count), so scores are unchanged.
    """
    spark = df.sparkSession
    qdf = _query_df(spark, query_terms)
    vocab = sorted({t for _, terms in query_terms for t in terms})
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    matched_toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        F.explode(toks).alias("term"),
    ).filter(F.col("term").isin(vocab))
    # unique per (doc, term) like postings(); max(dl) is a constant pick
    post = matched_toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"), F.max("dl").alias("dl")
    )
    # N/avgdl must cover every doc with >=1 token (explode drops null
    # texts, so a null-text doc never reaches dl in the postings form —
    # mirror that with an IS NOT NULL filter)
    stats_src = df.filter(F.col(text_col).isNotNull()).select(
        F.size(toks).cast("long").alias("dl")
    )
    return _score_topk(post, qdf, stats_src, k=k, k1=k1, b=b, dl_in_post=True)


def _query_df(spark, query_terms: list[tuple[int, list[str]]]) -> DataFrame:
    qrows = [(qid, t) for qid, terms in query_terms for t in terms]
    return spark.createDataFrame(qrows, "query_id INT, term STRING")


def _score_topk(
    post: DataFrame,
    qdf: DataFrame,
    dl: DataFrame,
    k: int,
    k1: float,
    b: float,
    dl_in_post: bool = False,
) -> DataFrame:
    """The BM25 scoring/ranking tail shared by the direct and the
    index-backed paths: ``post`` is (doc_id, term, tf) — unique per
    (doc, term) — and ``dl`` is (doc_id, dl) covering EVERY corpus doc
    (corpus stats must not depend on which terms are queried).

    ``dl_in_post`` (r14): the direct path derives dl map-side and carries
    it ON the postings rows; ``dl`` is then only the stats source (any
    frame with a ``dl`` column covering every tokenizable doc) and the
    per-doc dl join disappears."""
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias("avgdl"),
    )

    # Semi-join the corpus postings down to the query vocabulary FIRST:
    # df over the surviving postings equals global df for those terms
    # (postings are unique per (doc, term), so a plain count IS the doc
    # freq), and computing it before the query join keeps it correct even
    # when two queries share a term. (r14 note: a count-window form of df
    # was measured and rejected — it serializes the plan behind an extra
    # sort+window barrier, +0.45 s at sf0.1; the groupBy branch below
    # runs in parallel with the matched branch and, in the direct path,
    # consumes the already-vocab-filtered postings, so no corpus-sized
    # subtree is duplicated either way.)
    if dl_in_post:
        # direct path: post arrives already restricted to the query
        # vocabulary (the literal isin filter) — the qterms semi-join
        # would be a no-op stage
        relevant = post
    else:
        qterms = qdf.select("term").distinct()
        relevant = post.join(F.broadcast(qterms), "term")
    dfreq = relevant.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    matched = relevant.join(F.broadcast(qdf), "term")

    scored = matched.join(F.broadcast(dfreq), "term")
    if not dl_in_post:
        scored = scored.join(dl, "doc_id")
    scored = scored.crossJoin(F.broadcast(stats))
    idf_odds = ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)) / (
        F.col("df").cast("double") + F.lit(0.5)
    )
    tfn = (F.col("tf").cast("double") * F.lit(k1 + 1.0)) / (
        F.col("tf").cast("double")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl")))
    )
    per_term = scored.select(
        "query_id",
        "doc_id",
        F.round(idf_odds * tfn * F.lit(1000000.0)).cast("long").alias("micros"),
    )
    total = per_term.groupBy("query_id", "doc_id").agg(
        F.sum("micros").cast("long").alias("score_micros")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score_micros").desc(), F.col("doc_id"))
    return (
        total.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score_micros", "rank")
    )


N_INDEX_BUCKETS = 64


def term_bucket(col: Column | str) -> Column:
    """Hive-partition bucket for a term in the persisted inverted index:
    pmod(xxhash64(term), N_INDEX_BUCKETS). A query prunes its terms'
    buckets at LISTING time — reading 1/64th of the index per term
    instead of scanning it."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(N_INDEX_BUCKETS)).cast("int")


def bm25_topk_from_index(
    spark,
    index_path: str,
    query_terms: list[tuple[int, list[str]]],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k served from a PERSISTED inverted index (built/maintained
    by ``streaming.postings_index_sink``) instead of re-tokenizing the
    corpus: postings are read ONLY from the query terms' hash-bucket
    partitions (hive partition pruning at listing time — the scan is
    1/64th of the index per distinct term), doc lengths come from the
    index's doclen table, and the scoring tail is the exact same code the
    direct path runs — parity is pinned in tests. At 100 TB this is the
    difference between a full-corpus tokenize per query batch and a
    bounded read of a few index partitions."""
    qdf = _query_df(spark, query_terms)
    # resolve the query terms' buckets with one tiny job (xxhash64 is a
    # JVM function — the driver cannot compute it locally)
    buckets = [
        r["b"]
        for r in qdf.select(term_bucket("term").alias("b")).distinct().collect()
    ]
    post = (
        spark.read.parquet(f"{index_path}/postings")
        .filter(F.col("bucket").isin(buckets))  # partition-pruned at listing
        .select("doc_id", "term", "tf")
    )
    dl = spark.read.parquet(f"{index_path}/doclen").select("doc_id", "dl")
    return _score_topk(post, qdf, dl, k=k, k1=k1, b=b)


# ---------------------------------------------------------------------------
# Prefix-filtered exact Jaccard similarity self-join (AllPairs / PPJoin-lite)
# ---------------------------------------------------------------------------


def _gram_rows(df: DataFrame, text_col: str, id_col: str, ngram: int) -> DataFrame:
    """Exploded distinct word-ngram shingles: (doc_id, gram)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), ngram)).alias("gram"),
    )


def setsim_preflight(
    df: DataFrame,
    threshold: float,
    ngram: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    head_frac: float = 0.001,
) -> dict:
    """Pre-flight token-statistics probe for :func:`setsim_join_prefix`
    (r10 verdict task 4): PREDICT the prefix-filter's raw candidate
    volume from the gram document-frequency histogram alone — two
    aggregations over the same gram relation the operator's first
    shuffle builds, no joins, no candidate generation.

    Why it works: AllPairs orders grams rarest-first and each doc emits
    only its ``sz - ceil(t*sz) + 1`` rarest grams as join keys.  The
    probe mirrors that choice globally: fill the corpus's total prefix
    mass ``P = Σ_docs (sz - ceil(t*sz) + 1)`` with grams taken in
    ascending document frequency, and charge each taken gram its bucket
    collisions ``df·(df-1)/2`` (the boundary frequency class is taken
    pro-rata).  The estimate is an upper bound on the operator's raw
    prefix collisions in the uniform-doc-length regime (a globally-rare
    gram sits in the prefix of every doc containing it) and tracks the
    measured volume within a small factor across corpus draws — the
    PERF.md round-11 study correlates them on independent draws with
    varying Zipf heads.

    Returns a dict with the corpus statistics
    (``n_docs, total_grams, distinct_grams, avg_doc_grams``), the
    vocabulary-shape signals (``head_mass`` = share of gram occurrences
    in the most frequent ``head_frac`` of distinct grams;
    ``distinct_token_ratio`` = distinct/total), the fill diagnostics
    (``prefix_mass, df_cutoff``), and the decision outputs
    (``predicted_candidates``, ``predicted_candidates_per_doc``).

    MEASURED LIMITATION (PERF.md r11 probe study — keep this honest):
    on realistic Zipf corpora the fill lands entirely in the singleton
    class (singleton occurrences exceed the prefix mass), so
    ``predicted_candidates`` reads 0 while the operator still measures
    ~1e5 raw collisions — those come from DUPLICATE-structured docs
    whose prefixes are singleton-poor, a per-doc mixture a global
    histogram cannot see.  Interpret ``predicted_candidates == 0`` as
    the SINGLETON SCREEN: "random-doc prefixes are singleton-dominated;
    any candidate volume is duplicate structure, proportional to true
    dups".  A nonzero prediction (low-diversity corpora — boilerplate,
    templated logs) is the dangerous regime: it lower-bounds the floor
    and ``recommend`` flips to minhash.  For an EXACT pre-flight at
    linear cost use :func:`setsim_candidate_census` — it computes the
    operator's true raw prefix-collision count from the same two
    shuffles the operator runs anyway, before committing to the
    candidate join.  Driver-side cost here: collects the df-histogram
    only — O(distinct document-frequency VALUES), never O(vocabulary).
    """
    import math

    grams = _gram_rows(df, text_col, id_col, ngram)
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    # exact corpus prefix mass: Σ (sz - ceil(t*sz) + 1)
    stats_row = sizes.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("sz").alias("total_grams"),
        F.sum(
            F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz") - F.lit(1e-6)) + 1
        ).alias("prefix_mass"),
    ).collect()[0]
    n_docs, total_grams, prefix_mass = (
        int(stats_row["n_docs"]),
        int(stats_row["total_grams"] or 0),
        int(stats_row["prefix_mass"] or 0),
    )
    if n_docs == 0 or total_grams == 0:
        return {
            "n_docs": n_docs,
            "total_grams": 0,
            "distinct_grams": 0,
            "avg_doc_grams": 0.0,
            "head_mass": 0.0,
            "distinct_token_ratio": 0.0,
            "prefix_mass": 0,
            "df_cutoff": 0,
            "predicted_candidates": 0,
            "predicted_candidates_per_doc": 0.0,
            "recommend": "allpairs",
        }
    gfreq = grams.groupBy("gram").agg(F.count(F.lit(1)).cast("long").alias("gdf"))
    # bounded collect: one row per distinct FREQUENCY VALUE (not per gram)
    hist = {
        int(r["gdf"]): int(r["n"])
        for r in gfreq.groupBy("gdf").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    distinct_grams = sum(hist.values())
    # head mass: occurrences carried by the top head_frac of grams
    head_n = max(1, math.ceil(distinct_grams * head_frac))
    taken, occ = 0, 0
    for dfv in sorted(hist, reverse=True):
        take = min(hist[dfv], head_n - taken)
        occ += take * dfv
        taken += take
        if taken >= head_n:
            break
    head_mass = occ / total_grams
    # rarest-first fill of the prefix mass; charge df*(df-1)/2 per gram
    filled, pred = 0, 0.0
    df_cutoff = 0
    for dfv in sorted(hist):
        mass = hist[dfv] * dfv
        if filled + mass <= prefix_mass:
            pred += hist[dfv] * dfv * (dfv - 1) / 2.0
            filled += mass
            df_cutoff = dfv
        else:
            frac = (prefix_mass - filled) / mass
            pred += frac * hist[dfv] * dfv * (dfv - 1) / 2.0
            filled = prefix_mass
            df_cutoff = dfv
            break
    per_doc = pred / n_docs
    return {
        "n_docs": n_docs,
        "total_grams": total_grams,
        "distinct_grams": distinct_grams,
        "avg_doc_grams": total_grams / n_docs,
        "head_mass": round(head_mass, 4),
        "distinct_token_ratio": round(distinct_grams / total_grams, 4),
        "prefix_mass": prefix_mass,
        "df_cutoff": df_cutoff,
        "predicted_candidates": int(pred),
        "predicted_candidates_per_doc": round(per_doc, 2),
        "recommend": "allpairs" if per_doc <= 100 else "minhash",
    }


def _prefix_relation(
    df: DataFrame, threshold: float, ngram: int, text_col: str, id_col: str
) -> DataFrame:
    """The AllPairs prefix relation — each doc's ``sz - ceil(t·sz) + 1``
    rarest grams under the shared (df asc, gram) order; the exact stage
    the operator joins on (kept in one place so probe and operator can
    never drift)."""
    grams = _gram_rows(df, text_col, id_col, ngram)
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    gfreq = grams.groupBy("gram").agg(F.count(F.lit(1)).cast("long").alias("gdf"))
    return (
        grams.join(gfreq, "gram")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.col("gdf"), F.col("gram"))
            ),
        )
        .join(sizes, "doc_id")
        .filter(
            F.col("pos")
            <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz") - F.lit(1e-6)) + 1
        )
    )


def setsim_candidate_census(
    df: DataFrame,
    threshold: float,
    ngram: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT pre-flight: the raw prefix-bucket collision count
    ``Σ_g C(b_g, 2)`` the candidate join would have to process, computed
    from the prefix relation alone — the operator's LINEAR stages (two
    shuffles + a per-doc window), none of its quadratic-risk candidate
    join.  One row: ``raw_prefix_collisions, n_buckets, max_bucket``.
    This is the planner gate that works where the histogram probe is
    blind (PERF.md r11): run it, and if collisions/doc exceed ~1e2,
    yield to ``minhash_lsh_pairs`` before paying the join."""
    prefix = _prefix_relation(df, threshold, ngram, text_col, id_col)
    buckets = prefix.groupBy("gram").agg(F.count(F.lit(1)).cast("long").alias("b"))
    return buckets.agg(
        F.coalesce(F.sum(F.col("b") * (F.col("b") - 1) / 2), F.lit(0))
        .cast("long")
        .alias("raw_prefix_collisions"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.coalesce(F.max("b"), F.lit(0)).cast("long").alias("max_bucket"),
    )


def setsim_preflight_df(
    df: DataFrame,
    threshold: float,
    ngram: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    head_frac: float = 0.001,
) -> DataFrame:
    """Distributed, INTEGER-EXACT pre-flight row: corpus statistics, the
    histogram singleton-screen, AND the exact candidate census, computed
    entirely engine-side (no driver collect) so a SQL oracle can replay
    it bit-for-bit:

    ``n_docs, total_grams, distinct_grams, prefix_mass,
    singleton_screen_x2, head_n, head_occ, raw_prefix_collisions,
    max_bucket``

    ``singleton_screen_x2`` is the histogram rarest-first fill (×2 keeps
    the pro-rata boundary in integers): 0 on diverse corpora — a SCREEN
    ("random-doc prefixes are singleton-dominated; candidate volume is
    duplicate structure"), not a volume prediction — see
    :func:`setsim_preflight` for the measured limitation.
    ``raw_prefix_collisions`` is the EXACT census from
    :func:`setsim_candidate_census` — the number the planner actually
    gates on.  ``head_occ`` is the gram occurrences carried by the most
    frequent ``ceil(head_frac · distinct)`` grams — the Zipf-head mass
    behind the operator's vocabulary-shaped constant."""
    grams = _gram_rows(df, text_col, id_col, ngram)
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    corpus = sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("sz"), F.lit(0)).cast("long").alias("total_grams"),
        F.coalesce(
            F.sum(
                F.col("sz")
                - F.ceil(F.lit(threshold) * F.col("sz") - F.lit(1e-6))
                + 1
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("prefix_mass"),
    )
    gfreq = grams.groupBy("gram").agg(F.count(F.lit(1)).cast("long").alias("gdf"))
    hist = gfreq.groupBy("gdf").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = hist.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("distinct_grams")
    )
    # bounded: the histogram has one row per distinct document-frequency
    # VALUE (a few hundred on any corpus), never per gram — the
    # unpartitioned windows below run on that bounded relation
    w_asc = Window.orderBy("gdf").rowsBetween(Window.unboundedPreceding, 0)
    w_desc = Window.orderBy(F.col("gdf").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    mass = F.col("n") * F.col("gdf")
    fill = hist.withColumn("cum_mass", F.sum(mass).over(w_asc)).withColumn(
        "cum_n", F.sum("n").over(w_desc)
    )
    head_n = F.ceil(F.col("distinct_grams") * F.lit(head_frac)).cast("long")
    joined = fill.crossJoin(F.broadcast(corpus)).crossJoin(F.broadcast(tot))
    taken_mass = F.greatest(
        F.least(F.col("prefix_mass") - (F.col("cum_mass") - mass), mass), F.lit(0)
    )
    taken_head = F.greatest(
        F.least(head_n - (F.col("cum_n") - F.col("n")), F.col("n")), F.lit(0)
    )
    # GLOBAL agg (not a groupBy over corpus columns): a global agg always
    # yields exactly one row, so an EMPTY corpus (empty histogram → empty
    # `joined`) still produces the explicit zeroed record the dict twin
    # `setsim_preflight` returns, instead of zero rows that IndexError
    # a `.collect()[0]` caller and diverge from the SQL oracle.
    derived = joined.agg(
        F.coalesce(F.sum(taken_mass * (F.col("gdf") - 1)), F.lit(0))
        .cast("long")
        .alias("singleton_screen_x2"),
        F.coalesce(F.sum(taken_head * F.col("gdf")), F.lit(0))
        .cast("long")
        .alias("head_occ"),
    )
    census = setsim_candidate_census(df, threshold, ngram, text_col, id_col)
    return (
        corpus.crossJoin(F.broadcast(tot))  # both global aggs: 1 row always
        .crossJoin(F.broadcast(derived))
        .crossJoin(F.broadcast(census.drop("n_buckets")))
        .select(
            "n_docs",
            "total_grams",
            "distinct_grams",
            "prefix_mass",
            "singleton_screen_x2",
            head_n.alias("head_n"),
            "head_occ",
            "raw_prefix_collisions",
            "max_bucket",
        )
    )


def setsim_join_prefix(
    df: DataFrame,
    threshold: float,
    ngram: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_collisions_per_doc: float | None = None,
) -> DataFrame:
    """All pairs with word-`ngram` Jaccard >= `threshold`, exactly.

    ``max_collisions_per_doc`` (r11): an enforced pre-flight budget —
    when set, the exact candidate census
    (:func:`setsim_candidate_census`, the operator's LINEAR stages only)
    runs first, and a corpus whose raw prefix collisions per doc exceed
    the budget raises ``ValueError`` naming the measured volume and the
    minhash fallback INSTEAD of paying a quadratic-ish candidate join.
    The measured regime (PERF.md r11): healthy corpora sit at O(1)
    collisions/doc; boilerplate/templated corpora explode past ~1e2.
    None (default) skips the gate — zero cost on the happy path.

    1. Shingle each doc to its distinct word-ngram set (size `sz`).
    2. Global token order = (document frequency asc, gram asc) — rarest
       first, the canonical AllPairs ordering that minimizes candidate
       fan-out. Positions come from a row_number per doc over that order.
    3. Emit only each doc's PREFIX: positions 1 .. sz - ceil(t*sz) + 1.
       Completeness: J(a,b) >= t implies |a∩b| >= ceil(t*max(|a|,|b|)),
       and two sets whose overlap is >= alpha must collide within their
       (|s| - alpha + 1)-prefixes under a shared total order (Xiao et
       al., prefix-filter lemma) — so the prefix equi-join misses no
       qualifying pair. The size filter ceil(t*sz_a) <= sz_b (WLOG
       sz_a <= sz_b) prunes length-incompatible collisions for free.
    4. PPJoin POSITION filter (Xiao et al. WWW'08 §3.2): a prefix
       collision at positions (i, j) bounds the achievable overlap by
       min(sz_a - i, sz_b - j) + 1 (at most 1 common token up to the
       collision, everything after it in the shorter remainder). A pair
       survives only if its BEST collision's bound reaches the pair's
       required overlap alpha = ceil(t/(1+t) * (sz_a + sz_b)) — taking
       the max over collisions is an upper bound on PPJoin's
       first-collision bound, so the filter is sound (never drops a
       qualifying pair) while pruning most length-compatible collisions
       that happen deep in both prefixes.
    5. Exact verify: count shared grams per surviving candidate pair and
       keep inter/union >= t. One division per pair — jaccard is a
       single IEEE op, bit-identical to a SQL oracle's.

    Scale: the only corpus-sized shuffles are the shingle groupBys; the
    candidate join keys live on the RARE end of the gram vocabulary, so
    bucket sizes are small by construction (a gram with document
    frequency d contributes <= d(d-1)/2 collisions, and prefix grams are
    chosen to minimize d). No O(n²) stage at any point.
    """
    if max_collisions_per_doc is not None:
        census = setsim_candidate_census(
            df, threshold, ngram, text_col, id_col
        ).collect()[0]
        n_docs = df.count()
        if n_docs and census["raw_prefix_collisions"] > max_collisions_per_doc * n_docs:
            raise ValueError(
                f"setsim pre-flight budget exceeded: "
                f"{census['raw_prefix_collisions']} raw prefix collisions over "
                f"{n_docs} docs "
                f"({census['raw_prefix_collisions'] / n_docs:.1f}/doc > "
                f"{max_collisions_per_doc}/doc; max bucket "
                f"{census['max_bucket']}) — this corpus is boilerplate-heavy "
                f"for an exact AllPairs join at threshold {threshold}; use "
                f"minhash_lsh_pairs (approximate, candidate volume tracks "
                f"true pairs) or raise the budget"
            )
    # Deliberately NOT persisted: the gram relation is corpus-sized, and a
    # cache here would pin O(corpus) rows in executor memory at 100 TB. The
    # shingling is re-derived per consumer (3 scans of cheap codegen'd
    # expressions) — the expensive parts are the shuffles, which run once.
    grams = _gram_rows(df, text_col, id_col, ngram)
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    gfreq = grams.groupBy("gram").agg(F.count(F.lit(1)).cast("long").alias("gdf"))

    ordered = (
        grams.join(gfreq, "gram")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.col("gdf"), F.col("gram"))
            ),
        )
        .join(sizes, "doc_id")
    )
    # Every pruning bound below is ceil(ratio * n) computed in doubles. A
    # ratio whose binary repr sits ABOVE its decimal (e.g. 0.1) can push
    # ratio*n an ulp past an exact integer, making ceil over-estimate by 1
    # and the prune UNSOUND (a qualifying pair dropped). The 1e-6 slack
    # absorbs float error up to n ~ 1e9 grams; it can only UNDER-estimate
    # a bound (weaker pruning — the exact verify still rejects), never
    # over-estimate.
    def _ceil_mul(ratio: float, n: Column) -> Column:
        return F.ceil(F.lit(ratio) * n - F.lit(1e-6))

    # prefix length = sz - ceil(t*sz) + 1
    prefix = ordered.filter(
        F.col("pos") <= F.col("sz") - _ceil_mul(threshold, F.col("sz")) + 1
    ).select("doc_id", "gram", "pos", "sz")

    a = prefix.select(
        F.col("doc_id").alias("id_a"),
        F.col("gram"),
        F.col("pos").alias("pos_a"),
        F.col("sz").alias("sz_a"),
    )
    bb = prefix.select(
        F.col("doc_id").alias("id_b"),
        F.col("gram"),
        F.col("pos").alias("pos_b"),
        F.col("sz").alias("sz_b"),
    )
    # overlap needed for J >= t: alpha = ceil(t/(1+t) * (sz_a + sz_b))
    alpha = _ceil_mul(
        threshold / (1.0 + threshold), F.col("sz_a") + F.col("sz_b")
    )
    # overlap achievable given a collision at (pos_a, pos_b)
    ubound = (
        F.least(F.col("sz_a") - F.col("pos_a"), F.col("sz_b") - F.col("pos_b")) + 1
    )
    cand = (
        a.join(bb, "gram")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # size filter, both directions (either side may be smaller)
            & (_ceil_mul(threshold, F.col("sz_a")) <= F.col("sz_b"))
            & (_ceil_mul(threshold, F.col("sz_b")) <= F.col("sz_a"))
        )
        # position filter: best collision must be able to reach alpha
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.max(ubound).alias("best_ub"), F.max(alpha).alias("alpha"))
        .filter(F.col("best_ub") >= F.col("alpha"))
        .select("id_a", "id_b", "sz_a", "sz_b")
    )

    ga = grams.select(F.col("doc_id").alias("id_a"), F.col("gram"))
    gb = grams.select(F.col("doc_id").alias("id_b"), F.col("gram"))
    inter = (
        cand.join(ga, "id_a")
        .join(gb, ["id_b", "gram"])
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    out = inter.select(
        "id_a",
        "id_b",
        "inter",
        (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("long").alias("uni"),
        (
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
        ).alias("jaccard_sim"),
    ).filter(F.col("jaccard_sim") >= threshold)
    return out
