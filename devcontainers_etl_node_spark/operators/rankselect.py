"""Distributed exact rank selection — element-at-rank without a global
single-partition sort.

The naive way to fetch "the value at rank k of N rows" is
``row_number() OVER (ORDER BY ...)`` — an UNPARTITIONED window that
Spark executes by sorting the whole input on ONE reducer (the
``WindowExec: No Partition Defined`` warning; WindowGroupLimit rescues
``rank <= k`` filters but never ``rank == k``).  Fine at sf0.01, fatal
at 100 TB.  This module implements the scale-safe two-pass recipe the
repo already uses in spirit for `histogram_bins` / `group_quantiles`:

1. **Bounded histogram pass** — bin the sort value into ``n_bins``
   equal-width buckets (per-group min/max from one aggregate, then a
   map-side-combinable groupBy).  The histogram is ≤ groups × n_bins
   rows regardless of corpus size.
2. **Locate the rank** — the per-group histogram collapses to ONE
   array row (`collect_list` + higher-order running-sum fold —
   deliberately NOT an unpartitioned window, and a constant partition
   key would just constant-fold back into one).  The group total, the
   target ranks (derived from the total by the caller's rank rule,
   in-plan — no separate COUNT scan), and the bin containing each rank
   are all extracted from that single array row with array HOFs — no
   extra joins or stages.
3. **Rank within candidate bins only** — rows are joined to the
   broadcast candidate-bin list, then ranked with ``row_number() OVER
   (PARTITION BY group, bin ORDER BY ...)`` — a *partitioned* window
   whose state is one bin's worth of rows, about N / n_bins for
   non-degenerate value distributions.

So the only per-row work is three scans (min/max, histogram, candidate
filter) with no corpus-sized shuffle beyond the group-key hash
partitioning.  Degenerate caveat: if the value column is constant — or
so skewed that one equal-width bin holds nearly everything — the
candidate bin IS corpus-sized and step 3 of the one-shot plan degrades
to the naive sort; real corpora with 1024 bins keep bins ~0.1 % of N.
For inputs where that risk is real, :func:`exact_rank_select_recursive`
adds the guard: it reads each target's candidate-bin COUNT from the
histogram it already computed and, when the bin exceeds
``max_bin_rows``, recurses INTO the bin — re-binning on the bin's own
(tighter) min/max, or on the NEXT numeric sort column when the value is
constant within the bin (the 99 %-ties case equal-width binning can
never split) — so the final ranked partition is provably ≤
``max_bin_rows`` whenever any numeric sort column separates the rows.

Reference parity: the reference computes medians/quantiles by sorting
in pandas (eager, single-node — cf. /root/reference transform helpers);
the SQL oracles keep the row_number formulation, so these two very
different physical strategies must agree bit-for-bit on the selected
elements — ties are broken by an explicit unique tiebreak column, which
makes the total order (and thus the element at every rank) unique.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window, functions as F

# internal column names, prefixed to dodge user columns
_BIN = "__rs_bin"
_HBIN = "__rs_hbin"
_OFF = "__rs_offset"
_RN = "__rs_rn"
_HPFX = "__rs_h_"  # per-group join keys on the histogram side

RankRule = Callable[[Column], Column]
"""Maps the group-size Column (long) to an
``array<struct<target_id:int, target_rank:long>>`` of 1-based ranks to
select.  Evaluated in-plan, once per group, on the bounded histogram
row.  Ranks < 1 or > group size match no row."""


def quantile_rank_rule(fractions: list[float]) -> RankRule:
    """Nearest-rank targets ``greatest(1, ceil(p * n))`` for each
    fraction p (target_id = 1-based fraction index) — the type-1
    quantile rank rule shared with the SQL oracles (`group_quantiles`,
    `quantile_buckets`)."""

    def rule(n: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    F.lit(i + 1).alias("target_id"),
                    F.greatest(
                        F.lit(1).cast("long"), F.ceil(F.lit(p) * n).cast("long")
                    ).alias("target_rank"),
                )
                for i, p in enumerate(fractions)
            ]
        )

    return rule


def ntile_rank_rule(k: int) -> RankRule:
    """The k-1 boundary RANKS of ``ntile(k)`` (target_id = bucket i).

    ntile(k) over n rows fills the first ``n % k`` buckets with
    ``n div k + 1`` rows and the rest with ``n div k``, so bucket i ends
    at rank ``B_i = i*(n div k) + min(i, n mod k)``; a row of rank rn
    lands in bucket ``1 + #{i : rn > B_i}``.  Selecting the element at
    each B_i therefore lets bucket assignment become a broadcast
    threshold compare — exactly reproducing ntile without its global
    single-partition sort.  n = 0 yields rank-0 targets, which match
    nothing."""

    def rule(n: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    F.lit(i).alias("target_id"),
                    (
                        F.lit(i) * F.floor(n / k).cast("long")
                        + F.least(F.lit(i).cast("long"), n % k)
                    ).alias("target_rank"),
                )
                for i in range(1, k)
            ]
        )

    return rule


def exact_rank_select_by(
    df: DataFrame,
    part_cols: list[str],
    sort_cols: list[str],
    rank_rule: RankRule,
    n_bins: int = 1024,
) -> DataFrame:
    """Rows of ``df`` at the per-group ranks produced by ``rank_rule``,
    under the within-group total order ``ORDER BY sort_cols[0] ASC, ...``.

    ``part_cols`` may be empty (global selection).  The number of
    distinct groups must be small enough that ``groups × targets`` and
    ``groups × n_bins`` stay broadcast-sized — this is a rank-SELECTION
    helper (a handful of boundary elements), not a per-group quantile
    table over millions of groups.

    ``part_cols`` values must be NON-NULL: the histogram and candidate
    joins are plain equi-joins, so a row whose group key is NULL never
    matches its own group's bounds/hits rows and is silently dropped
    from selection (NOT an error).  Pre-filter or coalesce nullable
    group keys before calling.  The same applies to ``sort_cols[0]``
    (a NULL binning value falls out of the histogram join).

    ``sort_cols[0]`` must be numeric (it is the histogram binning
    value); for a DESC metric pass a pre-negated column.  The
    full tuple must be a TOTAL order within each group (include a
    unique tiebreak) or the selected element at a rank is
    nondeterministic.  The double cast used for binning is
    (non-strictly) order-preserving for every numeric source type, and
    within-bin order is re-established from the TRUE sort columns, so
    bin granularity only affects cost, never the selected element.

    Returns one row per matched target: ``target_id`` plus every column
    of ``df``.
    """
    v = F.col(sort_cols[0]).cast("double")
    bounds = df.groupBy(*part_cols).agg(
        F.min(v).alias("__rs_mn"), F.max(v).alias("__rs_mx")
    )
    if part_cols:
        binned_src = df.join(
            F.broadcast(
                bounds.select(
                    *[F.col(c).alias(_HPFX + c) for c in part_cols],
                    "__rs_mn",
                    "__rs_mx",
                )
            ),
            [F.col(c) == F.col(_HPFX + c) for c in part_cols],
        ).drop(*[_HPFX + c for c in part_cols])
    else:
        binned_src = df.crossJoin(F.broadcast(bounds))
    mn, mx = F.col("__rs_mn"), F.col("__rs_mx")
    bin_expr = (
        F.when(
            mx > mn,
            F.least(
                F.lit(n_bins - 1),
                F.greatest(F.lit(0), F.floor((v - mn) / (mx - mn) * n_bins)),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    binned = binned_src.withColumn(_BIN, bin_expr).drop("__rs_mn", "__rs_mx")

    hist = binned.groupBy(*part_cols, _BIN).agg(F.count(F.lit(1)).alias("__rs_c"))
    # ONE array row per group: sorted (bin, count) pairs running-summed
    # into (bin, count, cum_prev) by a higher-order fold (skips codegen,
    # but over ≤ n_bins structs per group that is noise)
    h = hist.groupBy(*part_cols).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(_BIN).alias("b"), F.col("__rs_c").alias("c")))
        ).alias("hs")
    )
    folded = F.aggregate(
        F.col("hs"),
        F.struct(
            F.lit(0).cast("long").alias("cum"),
            F.array().cast("array<struct<b:int,c:bigint,p:bigint>>").alias("out"),
        ),
        lambda acc, x: F.struct(
            (acc["cum"] + x["c"]).alias("cum"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        x["b"].alias("b"), x["c"].alias("c"), acc["cum"].alias("p")
                    )
                ),
            ).alias("out"),
        ),
        lambda acc: acc,  # keep both the running array and the total
    )
    # locate each target's bin INSIDE the array row: total → target
    # ranks (rank_rule, in-plan) → containing bin + residual offset, all
    # with array HOFs — no join, no extra scan of df
    located = F.filter(
        F.transform(
            rank_rule(F.col("__rs_f.cum")),
            lambda t: F.struct(
                t["target_id"].alias("target_id"),
                t["target_rank"].alias("target_rank"),
                F.filter(
                    F.col("__rs_f.out"),
                    lambda e: (t["target_rank"] > e["p"])
                    & (t["target_rank"] <= e["p"] + e["c"]),
                ).alias("bins"),
            ),
        ),
        lambda x: F.size(x["bins"]) == 1,
    )
    hits = (
        h.select(
            *[F.col(c).alias(_HPFX + c) for c in part_cols],
            F.col("hs"),
            folded.alias("__rs_f"),
        )
        .select(
            *[_HPFX + c for c in part_cols], F.explode(located).alias("t")
        )
        .select(
            *[_HPFX + c for c in part_cols],
            F.col("t.target_id").alias("target_id"),
            F.col("t.bins")[0]["b"].alias(_HBIN),
            (F.col("t.target_rank") - F.col("t.bins")[0]["p"]).alias(_OFF),
        )
    )

    # rank ONLY inside candidate bins — a PARTITIONED window over
    # ~N/n_bins rows per (group, bin)
    cand_keys = [F.col(c) == F.col(_HPFX + c) for c in part_cols] + [
        F.col(_BIN) == F.col(_HBIN)
    ]
    cand = binned.join(
        F.broadcast(hits.select(*[_HPFX + c for c in part_cols], _HBIN).distinct()),
        cand_keys,
    ).drop(*[_HPFX + c for c in part_cols], _HBIN)
    w_bin = Window.partitionBy(*part_cols, _BIN).orderBy(
        *[F.col(c).asc() for c in sort_cols]
    )
    ranked = cand.withColumn(_RN, F.row_number().over(w_bin))
    out = ranked.join(
        F.broadcast(hits),
        cand_keys + [F.col(_RN) == F.col(_OFF)],
    ).select("target_id", *df.columns)
    return out


def exact_rank_select(
    df: DataFrame,
    sort_cols: list[str],
    rank_rule: RankRule,
    n_bins: int = 1024,
) -> DataFrame:
    """Global (ungrouped) element-at-rank — see
    :func:`exact_rank_select_by` for semantics and scale notes."""
    return exact_rank_select_by(df, [], sort_cols, rank_rule, n_bins)


def exact_rank_select_recursive(
    df: DataFrame,
    part_cols: list[str],
    sort_cols: list[str],
    rank_rule: RankRule,
    n_bins: int = 1024,
    max_bin_rows: int = 100_000,
    max_depth: int = 4,
    stats: list | None = None,
) -> DataFrame:
    """Skew-guarded element-at-rank: like :func:`exact_rank_select_by`,
    but a candidate bin holding more than ``max_bin_rows`` rows is never
    sorted — the selection recurses INTO the bin instead.

    This is the degenerate-distribution guard the one-shot plan
    documents as its caveat.  It is DRIVER-PACED (one bounded
    bounds+histogram job per refinement level, like the iterative BPE /
    CC operators), so it trades plan laziness for a hard bound on the
    ranked partition — use it when the value distribution is unknown or
    adversarial; the lazy one-shot stays the default for the catalog
    callers whose distributions are measured.  Per level, per pending
    target: restrict to the current (group, bin-path) slice, recompute
    min/max on the CURRENT binning column — if the slice is constant on
    it (equal-width can never split ties), advance to the next numeric
    sort column, which is exactly the within-tie order — re-histogram,
    and either finish (bin ≤ ``max_bin_rows``: rank the one small bin)
    or descend with the residual rank.  Every job touches ≤ n_bins
    aggregate rows; corpus rows are only ever scanned with
    filter-pushdown predicates, never sorted globally.

    Preconditions are those of :func:`exact_rank_select_by` (non-null
    group keys and binning values; a numeric tie-break somewhere in
    ``sort_cols`` if ties can exceed ``max_bin_rows`` — a non-numeric
    tiebreak column stops the descent and the final window ranks the
    remaining tied slice as-is, documented fallback).  ``stats``, when
    given, receives one dict per (target, level) with the located bin's
    count — the observability hook the recursion test pins.

    Returns the same shape as :func:`exact_rank_select_by`."""
    casts = []
    for c in sort_cols:
        t = dict(df.dtypes).get(c, "")
        # NOT "date": Spark has no DateType→double cast, so a date sort
        # column would raise in the min/max step instead of taking the
        # documented non-numeric fallback (timestamp→double is fine:
        # epoch seconds).  Callers can pre-cast dates via datediff.
        casts.append(
            t.startswith(("int", "bigint", "smallint", "tinyint", "float", "double", "decimal", "timestamp"))
        )

    # targets per group: evaluate the rank rule on the (bounded) totals
    totals = df.groupBy(*part_cols).agg(F.count(F.lit(1)).alias("__rs_n"))
    t_rows = (
        totals.select(
            *part_cols, F.explode(rank_rule(F.col("__rs_n"))).alias("t")
        )
        .select(*part_cols, "t.target_id", "t.target_rank")
        .collect()
    )

    # work item: (group values, target_id, residual rank, predicate, sort col idx)
    def group_pred(r):
        p = F.lit(True)
        for c in part_cols:
            p = p & (F.col(c) == F.lit(r[c]))
        return p

    pending = [
        (tuple(r[c] for c in part_cols), r.target_id, int(r.target_rank), group_pred(r), 0)
        for r in t_rows
        if r.target_rank >= 1
    ]
    finals: list[DataFrame] = []

    for depth in range(max_depth):
        if not pending:
            break
        nxt = []
        for gvals, tid, rank, pred, ci in pending:
            rows = df.filter(pred)
            # advance past constant / non-numeric binning columns
            while ci < len(sort_cols):
                if not casts[ci]:
                    ci = len(sort_cols)  # non-numeric tiebreak: stop descent
                    break
                b = rows.agg(
                    F.min(F.col(sort_cols[ci]).cast("double")).alias("mn"),
                    F.max(F.col(sort_cols[ci]).cast("double")).alias("mx"),
                ).collect()[0]
                if b.mn is None or b.mn == b.mx:
                    ci += 1
                else:
                    break
            if ci >= len(sort_cols):
                # fully tied (or non-numeric remainder): any row of the
                # slice ranks identically under the remaining order —
                # rank the slice directly (bounded by the tie volume)
                finals.append(_rank_slice(rows, sort_cols, rank, tid, df.columns))
                continue
            v = F.col(sort_cols[ci]).cast("double")
            mn, mx = float(b.mn), float(b.mx)
            binc = F.least(
                F.lit(n_bins - 1),
                F.greatest(F.lit(0), F.floor((v - mn) / (mx - mn) * n_bins)),
            ).cast("int")
            hist = sorted(
                (r[0], r[1])
                for r in rows.groupBy(binc.alias("b")).agg(F.count(F.lit(1)).alias("c")).collect()
            )
            cum = 0
            hit = None
            for bno, c in hist:
                if cum < rank <= cum + c:
                    hit = (bno, rank - cum, c)
                    break
                cum += c
            if hit is None:
                continue  # rank beyond slice (empty-target rule)
            bno, off, c = hit
            if stats is not None:
                stats.append({"target_id": tid, "depth": depth, "bin_rows": c, "col": sort_cols[ci]})
            bin_pred = pred & (binc == F.lit(bno))
            if c <= max_bin_rows or depth == max_depth - 1:
                finals.append(_rank_slice(df.filter(bin_pred), sort_cols, off, tid, df.columns))
            else:
                nxt.append((gvals, tid, off, bin_pred, ci))
        pending = nxt

    if not finals:
        return df.select(F.lit(0).alias("target_id"), *df.columns).limit(0)
    out = finals[0]
    for f in finals[1:]:
        out = out.unionByName(f)
    return out


def _rank_slice(rows: DataFrame, sort_cols: list[str], rank: int, tid, cols) -> DataFrame:
    """Row at ``rank`` of one already-small slice: a single-partition
    window bounded by the recursion's max_bin_rows (or the tie volume)."""
    w = Window.partitionBy(F.lit(1)).orderBy(*[F.col(c).asc() for c in sort_cols])
    return (
        rows.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == rank)
        .select(F.lit(tid).alias("target_id"), *cols)
    )
