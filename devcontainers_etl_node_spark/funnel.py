"""Restartable staged curation funnel — pretrain_prep with parquet
staging tables instead of localCheckpoint.

`queries/catalog.py:pretrain_prep` bounds its plan with per-stage
``localCheckpoint`` — right for a single interactive run, but checkpoint
blocks die with the session. On a cluster the same stage boundary should
be a PERSISTED staging table: a 10-hour curation run that fails in stage
5 must resume from stage 4's output, not re-shuffle 100 TB. This module
is that production shape, runnable and tested here:

- every stage writes ``<workdir>/NN_name/`` as parquet and is READ BACK
  for the next stage (the read is the lineage barrier — same plan-size
  bound as the checkpoint, plus durability);
- a completed stage (parquet ``_SUCCESS`` marker present) is skipped on
  re-run and its table reused — crash-resume semantics;
- once any stage recomputes, every LATER stage recomputes too (a resumed
  run can never mix a new upstream with stale downstream outputs);
- the funnel report (stage → surviving docs + token mass) is derived
  from the staged tables and matches the single-DAG ``pretrain_prep``
  output row-for-row (pinned by tests/test_funnel.py).

Stage semantics are pretrain_prep's exactly: quality gate → exact dedup
→ MinHash near-dup removal (16 hashes / 4 bands, threshold 0.5) →
benchmark decontamination (doc_id%10==0 stand-in slice, 3-gram overlap)
→ greedy per-language sequence packing (512-token budget).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from devcontainers_etl_node_spark.operators import dedup as dd, packing
from devcontainers_etl_node_spark.operators import text as tx
from devcontainers_etl_node_spark.operators.skew import spread

STAGES = ("quality_gate", "exact_dedup", "near_dedup", "decontaminated", "packed")


def _stage_dir(workdir: str, idx: int, name: str) -> str:
    return os.path.join(workdir, f"{idx:02d}_{name}")


def _is_complete(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _quality_gate(docs: DataFrame) -> DataFrame:
    return docs.filter((F.length("text") >= 50) & (tx.quality_score("text") >= 0.2))


def _exact_dedup(gated: DataFrame) -> DataFrame:
    return dd.exact_dedup(gated)


def _near_dedup(exact: DataFrame) -> DataFrame:
    pairs = dd.minhash_lsh_pairs(exact, threshold=0.5, num_hashes=16, bands=4)
    near_drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return exact.join(F.broadcast(near_drop), "doc_id", "left_anti")


def _decontaminate(neardeduped: DataFrame, docs: DataFrame) -> DataFrame:
    bench_grams = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(F.explode(dd.word_shingles("text", 3)).alias("gram"))
        .distinct()
    )
    doc_grams = neardeduped.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id", F.explode(dd.word_shingles("text", 3)).alias("gram")
    )
    contaminated = (
        doc_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return neardeduped.filter(F.col("doc_id") % 10 != 0).join(
        F.broadcast(contaminated), "doc_id", "left_anti"
    )


def _pack(clean: DataFrame, max_tokens: int) -> DataFrame:
    return packing.pack_sequences(
        clean.withColumn("n_tokens", tx.token_count("text")),
        "n_tokens",
        "lang",
        "doc_id",
        max_tokens=max_tokens,
    )


def run_staged_funnel(
    spark: SparkSession,
    docs: DataFrame,
    workdir: str,
    max_tokens: int = 512,
) -> dict:
    """Run (or resume) the staged funnel under `workdir`.

    Returns {"tables": {stage: DataFrame}, "report": DataFrame,
    "computed": [stage names actually recomputed this run]} — `report`
    has the same (stage_no, stage, docs, tokens) rows as pretrain_prep.
    """
    docs = spread(docs)
    computed: list[str] = []
    tables: dict[str, DataFrame] = {}
    upstream_recomputed = False

    def materialize(idx: int, name: str, build) -> DataFrame:
        nonlocal upstream_recomputed
        path = _stage_dir(workdir, idx, name)
        if _is_complete(path) and not upstream_recomputed:
            return spark.read.parquet(path)
        build().write.mode("overwrite").parquet(path)
        computed.append(name)
        upstream_recomputed = True
        return spark.read.parquet(path)

    gated = materialize(1, "quality_gate", lambda: _quality_gate(docs))
    exact = materialize(2, "exact_dedup", lambda: _exact_dedup(gated))
    neardeduped = materialize(3, "near_dedup", lambda: _near_dedup(exact))
    clean = materialize(4, "decontaminated", lambda: _decontaminate(neardeduped, docs))
    packed = materialize(5, "packed", lambda: _pack(clean, max_tokens))
    tables.update(
        quality_gate=gated, exact_dedup=exact, near_dedup=neardeduped,
        decontaminated=clean, packed=packed,
    )

    def stage_row(name: str, order: int, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(order).alias("stage_no"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("docs"),
            F.coalesce(F.sum(tx.token_count("text")), F.lit(0)).alias("tokens"),
        )

    packed_summary = packed.agg(
        F.lit(5).alias("stage_no"),
        F.lit("packed").alias("stage"),
        F.countDistinct(F.concat_ws("|", "group", "seq_id")).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
    )
    report = (
        stage_row("raw", 0, docs)
        .unionByName(stage_row("quality_gate", 1, gated))
        .unionByName(stage_row("exact_dedup", 2, exact))
        .unionByName(stage_row("near_dedup", 3, neardeduped))
        .unionByName(stage_row("decontaminated", 4, clean))
        .unionByName(packed_summary)
        .orderBy("stage_no")
    )
    return {"tables": tables, "report": report, "computed": computed}
