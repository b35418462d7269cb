"""Command-line front door: ``python -m devcontainers_etl_node_spark <cmd>``.

The reference's entry point is ``python src/etl/etl.py`` (run the pipeline,
print previews — reference ``src/etl/etl.py:56-67``). This engine's front
door exposes the whole catalog instead:

    python -m devcontainers_etl_node_spark list
    python -m devcontainers_etl_node_spark run pricing_summary --sf /root/testdata/sf0.01
    python -m devcontainers_etl_node_spark run pricing_summary --explain
    python -m devcontainers_etl_node_spark sql "SELECT count(*) FROM lineitem" --sf ...
    python -m devcontainers_etl_node_spark pipeline        # reference ETL twin
    python -m devcontainers_etl_node_spark export --out /data/shards  # WebDataset tars

``sql`` registers every corpus table as a temp view, so the engine is usable
as a plain SQL shell over the lakehouse directory — the front door a
reference user switching to this repo would expect.
"""

from __future__ import annotations

import argparse
import os
import sys

DEFAULT_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _spark():
    from devcontainers_etl_node_spark.session import get_spark

    return get_spark()


def cmd_list(_args) -> int:
    from devcontainers_etl_node_spark.queries.catalog import ORACLE, QUERIES

    for name in sorted(QUERIES):
        kind = "SQL " if name in ORACLE else "ROWS"
        print(f"{kind} {name}")
    print(f"{len(QUERIES)} queries ({len(ORACLE)} oracle-checked)", file=sys.stderr)
    return 0


def cmd_run(args) -> int:
    from devcontainers_etl_node_spark.queries.catalog import QUERIES

    if args.query not in QUERIES:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2
    spark = _spark()
    df = QUERIES[args.query](spark, args.sf)
    if args.explain:
        df.explain("formatted")
        return 0
    df.show(args.rows, truncate=False)
    return 0


def cmd_sql(args) -> int:
    from devcontainers_etl_node_spark.catalog import table

    spark = _spark()
    for t in TABLES:
        try:
            table(spark, args.sf, t).createOrReplaceTempView(t)
        except Exception:  # missing table in a partial directory is fine
            pass
    df = spark.sql(args.statement)
    if args.explain:
        df.explain("formatted")
        return 0
    df.show(args.rows, truncate=False)
    return 0


def cmd_pipeline(args) -> int:
    """Reference-ETL twin on synthetic generator data (no external infra)."""
    from devcontainers_etl_node_spark.generators.synthetic import (
        gen_customers,
        gen_inventory_snapshots,
        gen_products,
        gen_sales_events,
    )
    from devcontainers_etl_node_spark.pipeline import transform_star_schema

    spark = _spark()
    prods = gen_products(spark, 25)
    custs = gen_customers(spark, 15)
    events = gen_sales_events(spark, args.rows, prods, custs)
    inv = gen_inventory_snapshots(spark, prods, warehouses=3, days=7)
    from pyspark.sql import functions as F

    inv = inv.withColumn("object", F.lit("synthetic"))
    tables = transform_star_schema(
        prods.withColumnRenamed("product_id", "id").withColumnRenamed(
            "product_name", "name"
        ),
        custs.withColumnRenamed("customer_id", "id"),
        events,
        inv,
    )
    for name, df in tables.items():  # preview, reference etl.py:65-67
        print(f"== {name}: {df.count()} rows")
        df.show(5, truncate=False)
    return 0


def cmd_curate(args) -> int:
    """Staged restartable curation funnel (funnel.py) over a corpus
    directory: writes per-stage parquet under --work, resumes from
    completed stages, prints the funnel report."""
    from devcontainers_etl_node_spark import funnel
    from devcontainers_etl_node_spark.catalog import table

    spark = _spark()
    docs = table(spark, args.sf, "documents")
    budget = (
        args.budget if args.budget is not None else funnel.DEFAULT_NEARDUP_BUDGET
    )
    out = funnel.run_staged_funnel(
        spark,
        docs,
        args.work,
        max_tokens=args.max_tokens,
        block_cols=_parse_block(args.block),
        max_collisions_per_doc=budget if budget > 0 else None,
        cross_block_recovery=args.cross_block_recovery,
    )
    if out["computed"]:
        print(f"computed stages: {', '.join(out['computed'])}", file=sys.stderr)
    else:
        print("all stages already complete — reusing staged outputs", file=sys.stderr)
    out["report"].show(truncate=False)
    return 0


def _parse_block(raw: str) -> list[str] | str | None:
    """``--block`` value → block_cols: 'auto' stays the sentinel, 'none'
    means unblocked, anything else is a comma-separated column list."""
    if raw == "auto":
        return "auto"
    if raw == "none":
        return None
    return [c.strip() for c in raw.split(",") if c.strip()]


def _check_block_pin(workdir: str, block: list[str] | None):
    """Validate the run's block key against the workdir pin (``_BLOCK.json``)
    and return a ``commit()`` that records it — called only AFTER the
    dedup run commits (r13 advice fix: pinning before the run meant a
    failed first run — a budget-gate refusal, a missing corpus — left a
    permanent pin for a contract the user never established, and the
    next run's mismatch error then steered them wrong).

    Blocking is a query choice the snapshot manifest deliberately does
    not pin — but an incremental CADENCE that flips the key mid-history
    emits pair sets under different contracts across runs (the operator
    docstring's warning). The CLI's ``--block auto`` re-resolves from
    each batch's columns, so without this pin a batch that happens to
    carry an extra column would silently change the contract. The first
    SUCCESSFUL run records the choice; later runs must match it or fail
    loudly (pass the recorded key explicitly, or start a fresh workdir).

    The pin is WRITE-AHEAD (r14 review fix): checking also records an
    intent ``{"key": ..., "for_version": next}`` so a run killed between
    the snapshot commit and ``commit()`` still pins its key — the next
    invocation promotes the intent if the snapshot version it named
    actually committed, and discards it otherwise (the same
    intent-vs-pointer resolution as the change-feed cursor). Without
    this, a kill in that window left a committed snapshot with NO pin,
    and a later run could silently flip the contract.

    Promotion is deliberately narrow (r14 review fix #2): the intent
    survives paths that commit NOTHING (a budget refusal, a no-new-data
    return, a pre-join crash), and the CLI is not the only writer — a
    pin-unaware ``run_incremental_dedup`` call can commit versions in
    between. So an intent is promoted only when the pointer sits EXACTLY
    at the version it named (``cur > for_version`` means foreign commits
    drove the workdir past our crashed run — unknowable provenance,
    discard), and, where the snapshot manifest records the block key as
    a layout property (bucketed stores), only when that recorded key
    agrees with the intent. A discarded intent is safe either way: the
    next successful CLI run re-pins, and bucketed manifests enforce
    their own key loudly (the manifest is authoritative; this pin is the
    CLI's earlier, friendlier check and the only guard for the legacy
    layout, where blocking is a per-query choice the manifest
    deliberately does not record)."""
    import json as _json

    from devcontainers_etl_node_spark.incremental import _MANIFEST, _read_current

    path = os.path.join(workdir, "_BLOCK.json")
    committed = None
    if os.path.exists(path):
        with open(path) as f:
            raw = _json.load(f)
        if isinstance(raw, dict):
            # leftover write-ahead intent: promoted iff its own run committed
            cur = _read_current(workdir)
            promote = cur is not None and cur == raw["for_version"]
            if promote:
                try:
                    with open(os.path.join(workdir, _MANIFEST)) as f:
                        manifest = _json.load(f)
                except (OSError, ValueError):
                    manifest = {}
                if "block_cols" in manifest and (
                    manifest["block_cols"] or []
                ) != raw["key"]:
                    promote = False  # committed by a run with another key
            if promote:
                committed = raw["key"]
                with open(path, "w") as f:
                    _json.dump(committed, f)
            else:
                os.remove(path)
        else:
            committed = raw
    if committed is not None and committed != (block or []):
        raise SystemExit(
            f"dedup workdir {workdir} committed block key {committed}; "
            f"this run resolved {block or []} — rerun with "
            f"--block {','.join(committed) if committed else 'none'} "
            f"or start a fresh workdir"
        )
    if committed is None:
        os.makedirs(workdir, exist_ok=True)
        with open(path, "w") as f:
            _json.dump(
                {"key": block or [], "for_version": (_read_current(workdir) or 0) + 1},
                f,
            )

    def commit() -> None:
        os.makedirs(workdir, exist_ok=True)
        with open(path, "w") as f:
            _json.dump(block or [], f)

    return block, commit


def cmd_dedup(args) -> int:
    """Snapshot-backed incremental MinHash dedup (incremental.py).

    Two feeds:
    - ``--table ROOT`` — the production shape: consume a transactional
      corpus table's CHANGE FEED (txlog tx_changes); the corpus-version
      cursor advances exactly once per batch, no directory listing, no
      batch bookkeeping by the caller.
    - ``--new DIR [--old DIR]`` — hand-fed batches: dedup the --new
      batch against the committed signature snapshot under --work
      (first run = whole batch, one code path); --old must name the
      corpus the current snapshot covers (text read only for candidate
      verify).
    Either way the verified pair list lands under --work/pairs/run_N
    and the merged snapshot commits for the next run.

    ``--block``/``--budget`` (r13): blocked banding + the census budget
    gate, the pipeline-level defaults the 4M ladder justified ('auto' =
    the composite lang,source key where the corpus carries those
    columns; budget 32/doc — funnel.DEFAULT_NEARDUP_BUDGET). 'none' /
    a budget <= 0 opt out (the library primitive's contract)."""
    from devcontainers_etl_node_spark import funnel as _funnel
    from devcontainers_etl_node_spark.catalog import table
    from devcontainers_etl_node_spark.incremental import (
        run_incremental_dedup,
        run_incremental_dedup_from_table,
    )

    if args.compact_store:
        from devcontainers_etl_node_spark.incremental import compact_dedup_store

        out = compact_dedup_store(_spark(), args.work)
        if out["folded_dirs"]:
            print(
                f"compacted through v{out['compacted_through']}: folded "
                f"{out['folded_dirs']} delta dirs into {out['sig_files']} sig + "
                f"{out['shingle_files']} shingle files",
                file=sys.stderr,
            )
        else:
            print("nothing to fold — store already compact", file=sys.stderr)
        return 0
    spark = _spark()
    raw_budget = (
        args.budget if args.budget is not None else _funnel.DEFAULT_NEARDUP_BUDGET
    )
    budget = raw_budget if raw_budget > 0 else None
    store_kw = dict(
        persist_shingles=args.persist_shingles or bool(args.store_buckets),
        store_buckets=args.store_buckets,
    )
    if args.table:
        block = _parse_block(args.block)
        if block == "auto":
            from devcontainers_etl_node_spark.sinks import txlog

            head = txlog.tx_head(args.table)
            block = (
                _funnel.default_block_cols(txlog.tx_read(spark, args.table, version=head))
                if head is not None
                else []
            )
        block, commit_pin = _check_block_pin(args.work, block or None)
        out = run_incremental_dedup_from_table(
            spark,
            args.table,
            args.work,
            block_cols=block or None,
            max_collisions_per_doc=budget,
            **store_kw,
        )
        if out.get("no_new_data"):
            print(
                f"corpus unchanged at v{out['corpus_version']} — nothing to do",
                file=sys.stderr,
            )
            return 0
        commit_pin()
    else:
        if not args.new:
            print("one of --table or --new is required", file=sys.stderr)
            return 2
        new_docs = table(spark, args.new, "documents")
        old_docs = table(spark, args.old, "documents") if args.old else None
        block = _parse_block(args.block)
        if block == "auto":
            block = _funnel.default_block_cols(new_docs)
        block, commit_pin = _check_block_pin(args.work, block or None)
        out = run_incremental_dedup(
            spark,
            new_docs,
            args.work,
            old_docs=old_docs,
            block_cols=block or None,
            max_collisions_per_doc=budget,
            **store_kw,
        )
        commit_pin()
    print(f"snapshot v{out['version']} committed: {out['n_pairs']} near-dup pairs", file=sys.stderr)
    out["pairs"].show(20, truncate=False)
    return 0


def cmd_table(args) -> int:
    """Transactional-table maintenance (sinks/txlog.py): ``history``
    prints the commit log (version, mode, operation); ``compact``
    rewrites the head snapshot into ~target-sized files as a new version
    (older versions stay time-travel readable); ``vacuum`` reclaims
    files unreferenced by the retained window AND older than the
    retention grace period (in-flight writers protected); ``merge``
    upserts a parquet batch by key with the pruned copy-on-write
    rewrite (tx_merge); ``export-delta`` / ``export-iceberg`` translate
    the table's history in place into the standard open formats
    (sinks/delta_export.py, sinks/iceberg_export.py — zero data
    movement, any Delta/Iceberg reader can then open the table)."""
    from devcontainers_etl_node_spark.sinks import txlog

    if args.op == "history":
        rows = txlog.tx_history(args.root)
        if not rows:
            print("no committed versions", file=sys.stderr)
            return 1
        for h in rows:
            print(f"v{h['version']}  {h['mode']:<9}  {h['operation'] or ''}")
    elif args.op == "compact":
        v = txlog.tx_compact(_spark(), args.root)
        print(f"compacted -> v{v}", file=sys.stderr)
    elif args.op == "vacuum":
        deleted = txlog.tx_vacuum(
            args.root, keep_last=args.keep_last, retention_hours=args.retention_hours
        )
        print(f"reclaimed {len(deleted)} paths", file=sys.stderr)
    elif args.op == "merge":
        if not args.updates or not args.key:
            print("merge requires --updates PARQUET and --key COLUMN", file=sys.stderr)
            return 2
        spark = _spark()
        v = txlog.tx_merge(
            spark, spark.read.parquet(args.updates), args.root, key=args.key
        )
        print(f"merged -> v{v}", file=sys.stderr)
    elif args.op == "restore":
        if args.to_version is None:
            print("restore requires --to-version N", file=sys.stderr)
            return 2
        v = txlog.tx_restore(args.root, args.to_version)
        print(f"restored v{args.to_version} -> v{v}", file=sys.stderr)
    elif args.op == "export-delta":
        from devcontainers_etl_node_spark.sinks.delta_export import tx_export_delta

        written = tx_export_delta(args.root)
        print(
            f"exported {len(written)} Delta commits -> {args.root}/_delta_log",
            file=sys.stderr,
        )
    elif args.op == "export-iceberg":
        from devcontainers_etl_node_spark.sinks.iceberg_export import tx_export_iceberg

        path = tx_export_iceberg(args.root)
        print(f"exported Iceberg v2 metadata -> {path}", file=sys.stderr)
    return 0


def cmd_export(args) -> int:
    """Last mile of the curation story: pack the corpus into
    fixed-token-budget shards (token_shard_assign — distributed prefix
    sum, no global window) and stream them out as reproducible
    WebDataset tars (write_webdataset). Same corpus + budget → byte-
    identical shards, so the export is content-addressable and safe to
    re-run."""
    from pyspark.sql import functions as F

    from devcontainers_etl_node_spark.catalog import table
    from devcontainers_etl_node_spark.operators.prefixsum import token_shard_assign
    from devcontainers_etl_node_spark.sinks.webdataset import write_webdataset

    spark = _spark()
    docs = table(spark, args.sf, "documents")
    assign = token_shard_assign(docs, tokens_per_shard=args.tokens_per_shard)
    packed = docs.join(assign.select("doc_id", "shard_id"), "doc_id").select(
        "doc_id", "shard_id", "text", "lang", "source"
    )
    write_webdataset(
        packed, args.out, "shard_id", "doc_id", "text", meta_cols=["lang", "source"]
    )
    n_shards = assign.agg(F.countDistinct("shard_id")).collect()[0][0]
    print(f"exported {n_shards} shards to {args.out}", file=sys.stderr)
    return 0


def cmd_dedup_plan(args) -> int:
    """Planner UX over dedup.minhash_geometry (r11): print the chosen
    banded-LSH geometry, its detection probability, the calibrated
    random-collision floor at the given corpus size, and the floor
    crossover — plus the blocking advice when the crossover is near, and
    (r13) the PARTITION-SIZING rule the 4M rung taught: per-task data
    must stay constant as the corpus grows (shuffle partitions ~n/20k;
    scan splits sized to ~20k docs when --avg-doc-bytes is given)."""
    import json as _json

    from devcontainers_etl_node_spark.operators.dedup import (
        minhash_geometry,
        minhash_partition_plan,
    )

    n = int(args.docs) if args.docs else None
    g = minhash_geometry(
        args.threshold, args.recall, n_docs=n, max_hashes=args.max_hashes
    )
    if g is not None and n is not None:
        # blocking advice rides EVERY --docs invocation (r13 verdict task
        # 5: the ~10²⁺-family-consistent-blocks rule the 4M ladder proved
        # appeared only in refusal messages) — the UNBLOCKED numbers,
        # before any --blocks adjustment below
        unblocked_per_doc = g.get("predicted_floor_candidates", 0) / max(n, 1)
        print(
            f"blocking: at n={n:.0f} the unblocked random-collision floor "
            f"≈ {unblocked_per_doc:.1f} candidates/doc (crossover "
            f"{g['floor_crossover_docs']:.0f} docs) — block on a "
            f"family-consistent key with ≳100 values (e.g. lang×source): "
            f"the floor scales by 1/blocks, the crossover by ×blocks "
            f"(measured at 4M/10M docs, PERF.md r12-r13)",
            file=sys.stderr,
        )
    if g is not None and args.blocks > 1:
        # balanced blocking: floor = sum_b f(n/B) = f(n)/B  =>  the
        # crossover n where floor ~ 10n moves out by exactly B
        g["blocks"] = args.blocks
        g["floor_crossover_docs"] *= args.blocks
        if "predicted_floor_candidates" in g:
            g["predicted_floor_candidates"] //= args.blocks
    if g is None:
        print(
            f"no geometry reaches recall {args.recall} at threshold "
            f"{args.threshold} within {args.max_hashes} hashes — lower the "
            f"recall target, raise the threshold, or raise --max-hashes",
            file=sys.stderr,
        )
        return 2
    if n is not None:
        # sizing advice rides the same JSON line so scripted callers get
        # geometry + partitioning in one parse
        g["partitioning"] = minhash_partition_plan(
            n, avg_doc_bytes=args.avg_doc_bytes
        )
        if args.avg_doc_bytes:
            # bucketed-store sizing (r14): the shingle store is ~2 B per
            # corpus char on disk; bucket files must stay >=~64 MB for the
            # compacted base's dir-prune to beat its own small-file
            # overhead (measured: 4096 buckets on a 750 MB store made the
            # pruned step 4x SLOWER than a plain scan), and prune
            # selectivity is ~min(1, candidates/buckets) — so dir-prune
            # pays once the store is >=~100 GB and grows with it
            store_bytes = 2 * n * args.avg_doc_bytes
            g["store_buckets"] = max(16, int(store_bytes // (64 << 20)))
            print(
                f"bucketed store: store_buckets={g['store_buckets']} "
                f"(shingle store ~{store_bytes / 1e9:.1f} GB at ~2 B/char, "
                f"~64 MB/bucket after compaction; dir-prune selectivity "
                f"~min(1, candidates/buckets) — a >=100 GB-store feature, "
                f"below that run plain deltas without compaction)",
                file=sys.stderr,
            )
        print(
            f"partitioning: set spark.sql.shuffle.partitions="
            f"{g['partitioning']['shuffle_partitions']} (~"
            f"{g['partitioning']['docs_per_task']} docs/task — per-task "
            f"data constant as the corpus grows; the 4M-doc rung OOM'd at "
            f"the 32-partition session default and passed at n/20k, "
            f"PERF.md r12)"
            + (
                f"; spark.sql.files.maxPartitionBytes="
                f"{g['partitioning']['max_partition_bytes']}"
                if g["partitioning"]["max_partition_bytes"]
                else ""
            ),
            file=sys.stderr,
        )
    print(_json.dumps(g))
    if n is not None and n > g["floor_crossover_docs"]:
        print(
            f"WARNING: {n:.0f} docs is past this geometry's floor crossover "
            f"({g['floor_crossover_docs']:.0f}) — the random band-collision "
            f"floor will dominate. Block the corpus "
            f"(minhash_lsh_pairs(block_cols=[...]) — floor becomes "
            f"O(sum n_b^2)) or raise the threshold.",
            file=sys.stderr,
        )
    return 0


def cmd_generate(args) -> int:
    """G6 continuous generator fleet twin (reference data_chargers/load.py)."""
    from devcontainers_etl_node_spark.config import EngineConfig
    from devcontainers_etl_node_spark.generators.charger import run_chargers

    cfg = EngineConfig()
    if args.interval is not None:
        cfg.interval_seconds = args.interval
    if args.magnitude is not None:
        cfg.magnitude_order = args.magnitude
    spark = _spark()
    history = run_chargers(spark, args.out, cycles=args.cycles, config=cfg)
    for i, counts in enumerate(history):
        print(f"cycle {i}: {counts}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="devcontainers_etl_node_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list catalog queries")

    r = sub.add_parser("run", help="run a catalog query")
    r.add_argument("query")
    r.add_argument("--sf", default=DEFAULT_SF, help="corpus directory")
    r.add_argument("--rows", type=int, default=20)
    r.add_argument("--explain", action="store_true", help="print the physical plan")

    s = sub.add_parser("sql", help="run ad-hoc SQL over the corpus views")
    s.add_argument("statement")
    s.add_argument("--sf", default=DEFAULT_SF)
    s.add_argument("--rows", type=int, default=20)
    s.add_argument("--explain", action="store_true")

    pl = sub.add_parser("pipeline", help="reference ETL twin on synthetic data")
    pl.add_argument("--rows", type=int, default=40, help="sales events to generate")

    c = sub.add_parser("curate", help="staged restartable curation funnel")
    c.add_argument("--sf", default=DEFAULT_SF, help="corpus directory")
    c.add_argument("--work", required=True, help="staging directory for per-stage parquet")
    c.add_argument("--max-tokens", type=int, default=512, help="packing budget")
    c.add_argument(
        "--block",
        default="auto",
        help="near-dedup block key: 'auto' (composite lang,source where "
        "present), 'none' (unblocked), or a comma-separated column list",
    )
    c.add_argument(
        "--budget",
        type=float,
        default=None,
        help="census budget gate, max raw band collisions per doc "
        "(<=0 disables; default funnel.DEFAULT_NEARDUP_BUDGET)",
    )
    c.add_argument(
        "--cross-block-recovery",
        action="store_true",
        help="after the blocked near-dedup pass, recover cross-block "
        "pairs via the bounded rep-per-cluster global re-band "
        "(measured recall 0.98 of blocking-dropped pairs; requires a "
        "non-empty block key)",
    )

    d = sub.add_parser("dedup", help="snapshot-backed incremental MinHash dedup")
    d.add_argument("--new", default=None, help="corpus directory of the arriving batch")
    d.add_argument("--old", default=None, help="corpus directory the snapshot covers")
    d.add_argument("--table", default=None, help="txlog corpus root: consume its change feed instead of --new/--old")
    d.add_argument("--work", required=True, help="snapshot directory (sigs + pairs)")
    d.add_argument(
        "--block",
        default="auto",
        help="blocked banding key: 'auto' (composite lang,source where "
        "present), 'none' (unblocked), or a comma-separated column list",
    )
    d.add_argument(
        "--budget",
        type=float,
        default=None,
        help="census budget gate, max raw band collisions per NEW doc "
        "(<=0 disables; default funnel.DEFAULT_NEARDUP_BUDGET)",
    )
    d.add_argument(
        "--persist-shingles",
        action="store_true",
        help="also persist per-batch shingle deltas so later steps never "
        "re-read historical text (space-for-time; part of the snapshot "
        "contract)",
    )
    d.add_argument(
        "--store-buckets",
        type=int,
        default=None,
        help="bucketed store layout (implies --persist-shingles): sig + "
        "shingle DELTA dirs partitioned into N id-hash buckets — O(batch) "
        "writes, candidate-bucket-pruned verify reads, --old never needed; "
        "the block key joins the snapshot contract",
    )
    d.add_argument(
        "--compact-store",
        action="store_true",
        help="fold the bucketed store's per-batch delta dirs into one "
        "compacted base (bounds per-step listing/plan growth), then exit",
    )

    t = sub.add_parser("table", help="transactional-table maintenance (txlog)")
    t.add_argument("op", choices=["history", "compact", "vacuum", "merge", "restore", "export-delta", "export-iceberg"])
    t.add_argument("root", help="table root directory")
    t.add_argument("--keep-last", type=int, default=2, help="versions vacuum retains")
    t.add_argument("--retention-hours", type=float, default=24.0, help="vacuum grace window for unreferenced files")
    t.add_argument("--updates", help="merge: parquet path with the upsert rows")
    t.add_argument("--key", help="merge: unique non-null join key column")
    t.add_argument("--to-version", type=int, help="restore: version to roll back to")

    e = sub.add_parser("export", help="pack corpus into WebDataset tar shards")
    e.add_argument("--sf", default=DEFAULT_SF, help="corpus directory")
    e.add_argument("--out", required=True, help="shard output directory (path or URI)")
    e.add_argument(
        "--tokens-per-shard", type=int, default=4096, help="token budget per shard"
    )

    dp = sub.add_parser(
        "dedup-plan",
        help="pick a MinHash LSH geometry for a threshold/recall/corpus size",
    )
    dp.add_argument("--threshold", type=float, required=True, help="Jaccard threshold")
    dp.add_argument("--recall", type=float, default=0.9, help="target recall at threshold")
    dp.add_argument("--docs", type=float, default=None, help="corpus size (floats ok: 1e9)")
    dp.add_argument("--max-hashes", type=int, default=256, help="signature budget")
    dp.add_argument(
        "--avg-doc-bytes",
        type=int,
        default=None,
        help="average document size; adds a scan-split "
        "(maxPartitionBytes) recommendation sized to ~20k docs/split",
    )
    dp.add_argument(
        "--blocks",
        type=int,
        default=1,
        help="balanced block count (block_cols blocking): floor and "
        "crossover scale by 1/blocks and x blocks respectively",
    )

    g = sub.add_parser("generate", help="continuous generator fleet (G6 twin)")
    g.add_argument("--out", required=True, help="lakehouse root for the three sinks")
    g.add_argument("--cycles", type=int, default=0, help="cycles to run (0 = forever)")
    g.add_argument("--interval", type=int, default=None, help="seconds between cycles")
    g.add_argument("--magnitude", type=int, default=None, help="events per cycle")

    args = p.parse_args(argv)
    return {
        "list": cmd_list,
        "run": cmd_run,
        "sql": cmd_sql,
        "pipeline": cmd_pipeline,
        "curate": cmd_curate,
        "dedup": cmd_dedup,
        "table": cmd_table,
        "export": cmd_export,
        "dedup-plan": cmd_dedup_plan,
        "generate": cmd_generate,
    }[args.cmd](args)


if __name__ == "__main__":
    raise SystemExit(main())
