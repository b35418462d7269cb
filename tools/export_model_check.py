"""Model-based randomized check of the Delta + Iceberg exporters
(r10 verdict task 3 — the in-sandbox ceiling for "no real runtime has
opened the output"): random txlog op sequences (append / merge with
updates+deletes / overwrite / restore / schema-evolve / compact /
idempotent-append / vacuum), BOTH exporters refreshed after EVERY
commit (exactly the streaming ``txlog_sink(export='both')`` cadence, so
the r11 incremental-append paths and the vacuum-triggered rebuilds are
both exercised), and after every commit the INDEPENDENT replays
(``delta_log_snapshot`` / ``iceberg_snapshot``) are compared to the
txlog manifest at EVERY retained version:

- Delta: per-version prefix fold of the commit files (live file set +
  per-file numRecords + sizes) == manifest(v) files; head schema field
  names == committed schema; carried txn marks == manifest txns.
- Iceberg: per-version time travel through snapshot ids (manifest-list
  → manifests → live files, parsed via each Avro file's own embedded
  schema) == manifest(v) files; current sequence number == retained
  count; top-level field ids never change across the sequence.

Run standalone for the committed artifact (200 sequences by default):

    python tools/export_model_check.py [n_sequences] [ops_per_seq]

Exit code 0 + one summary line per 20 sequences; any divergence raises
with the (seed, version) that reproduces it.  tests/test_txlog.py runs
the same checker over 3 seeds as the always-on pytest gate.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _delta_versions(root: str) -> dict[int, dict[str, dict]]:
    """Independent per-version replay of the Delta log: fold the commit
    files in order, recording the live file set after each commit."""
    log_dir = os.path.join(root, "_delta_log")
    out: dict[int, dict[str, dict]] = {}
    live: dict[str, dict] = {}
    for fn in sorted(os.listdir(log_dir)):
        if not fn.endswith(".json") or not fn[:-5].isdigit():
            continue
        with open(os.path.join(log_dir, fn)) as f:
            for line in f:
                if not line.strip():
                    continue
                a = json.loads(line)
                if "add" in a:
                    add = a["add"]
                    live[add["path"]] = {
                        "size": add["size"],
                        "rows": json.loads(add["stats"])["numRecords"],
                    }
                elif "remove" in a:
                    live.pop(a["remove"]["path"], None)
        out[int(fn[:-5])] = dict(live)
    return out


def check_sequence(spark, base_dir: str, seed: int, n_ops: int = 8) -> int:
    """One random op sequence against one table; returns ops executed.
    Raises AssertionError tagged (seed, version, ...) on any divergence."""
    import random

    from pyspark.sql import functions as F

    from devcontainers_etl_node_spark.sinks import txlog
    from devcontainers_etl_node_spark.sinks.delta_export import (
        delta_log_snapshot,
        tx_export_delta,
    )
    from devcontainers_etl_node_spark.sinks.iceberg_export import (
        iceberg_snapshot,
        tx_export_iceberg,
    )

    rng = random.Random(seed)
    root = os.path.join(base_dir, f"t{seed}")
    shutil.rmtree(root, ignore_errors=True)
    location = os.path.abspath(root)

    def df(lo, hi, tag, extra=False):
        d = spark.range(lo, hi).select(F.col("id"), F.lit(tag).alias("batch"))
        return d.withColumn("extra", F.lit(1.5)) if extra else d

    next_id = 0
    idem = 0
    executed = 0
    for _ in range(n_ops):
        head = txlog.tx_head(root)
        # does the CURRENT committed schema carry the evolved column?
        # (derived, not tracked: compact/restore/overwrite all change it)
        evolved = head is not None and "extra" in (
            txlog._read_manifest(root, head).get("schema") or {}
        )
        op = rng.choice(
            ["append", "append", "merge", "overwrite", "restore",
             "evolve", "compact", "idem", "vacuum"]
        )
        if head is None and op != "append":
            op = "append"
        if op == "append":
            n = rng.randint(1, 5)
            txlog.tx_write(df(next_id, next_id + n, "a", evolved), root)
            next_id += n
        elif op == "merge":
            live_rows = txlog.tx_read(spark, root).select("id").limit(3).collect()
            upd = [(r.id, "U", False) for r in live_rows[:2]]
            if live_rows[2:]:
                upd.append((live_rows[2].id, None, True))  # tombstone
            upd.append((next_id, "I", False))
            next_id += 1
            changelog = spark.createDataFrame(
                upd, "id LONG, batch STRING, is_delete BOOLEAN"
            )
            if evolved:
                changelog = changelog.withColumn("extra", F.lit(2.5))
            txlog.tx_merge(spark, changelog, root, key="id", delete_col="is_delete")
        elif op == "overwrite":
            n = rng.randint(1, 4)
            txlog.tx_write(df(next_id, next_id + n, "o"), root, mode="overwrite")
            next_id += n
        elif op == "restore":
            vs = [
                v
                for v in range(0, head + 1)
                if os.path.exists(txlog._manifest_path(root, v))
            ]
            txlog.tx_restore(root, rng.choice(vs))
        elif op == "evolve":
            n = rng.randint(1, 3)
            txlog.tx_write(
                df(next_id, next_id + n, "e", extra=True),
                root,
                allow_schema_change=True,
            )
            next_id += n
        elif op == "compact":
            txlog.tx_compact(spark, root, target_file_bytes=4096)
        elif op == "idem":
            txlog.tx_write_idempotent(
                df(next_id, next_id + 2, "i", evolved), root, "mdl-app", idem
            )
            idem += 1
            next_id += 2
        elif op == "vacuum":
            txlog.tx_vacuum(root, keep_last=2, retention_hours=0)
            tx_export_delta(root)
            tx_export_iceberg(root)
            executed += 1
            # vacuum commits nothing; exports rebuilt — verify head only
            _verify_head(root, location, txlog, delta_log_snapshot, iceberg_snapshot)
            continue

        tx_export_delta(root)
        tx_export_iceberg(root)
        executed += 1

        head = txlog.tx_head(root)
        base = head
        while base > 0 and os.path.exists(txlog._manifest_path(root, base - 1)):
            base -= 1

        # ---- Delta: every retained version's live file set, exactly
        dv = _delta_versions(root)
        assert sorted(dv) == list(range(head - base + 1)), (seed, head, sorted(dv))
        for v in range(base, head + 1):
            m = txlog._read_manifest(root, v)
            want = {
                e["path"]: {"size": int(e["bytes"]), "rows": int(e["rows"])}
                for e in m["files"]
            }
            assert dv[v - base] == want, ("delta", seed, v)
        snap = delta_log_snapshot(root)
        hm = txlog._read_manifest(root, head)
        assert [f["name"] for f in snap["schema"]["fields"]] == list(
            (hm.get("schema") or {}).keys()
        ), ("delta-schema", seed, head)
        assert snap["txns"] == {a: int(b) for a, b in (hm.get("txns") or {}).items()}, (
            "delta-txns",
            seed,
        )

        # ---- Iceberg: time travel to every retained version
        cur = iceberg_snapshot(root)
        assert cur["sequence_number"] == head - base + 1, ("iceberg-seq", seed)
        for v in range(base, head + 1):
            m = txlog._read_manifest(root, v)
            got = iceberg_snapshot(root, snapshot_id=1000 + (v - base))
            want = {
                f"{location}/{e['path']}": {
                    "size": int(e["bytes"]),
                    "records": int(e["rows"]),
                }
                for e in m["files"]
            }
            assert got["files"] == want, ("iceberg", seed, v)
        # field-id stability: id of 'id'/'batch' fixed at 1/2 for life
        top = {f["name"]: f["id"] for f in cur["schema"]["fields"]}
        assert top.get("id") == 1 and top.get("batch") == 2, ("iceberg-ids", seed, top)

    shutil.rmtree(root, ignore_errors=True)
    return executed


def _verify_head(root, location, txlog, delta_log_snapshot, iceberg_snapshot):
    head = txlog.tx_head(root)
    hm = txlog._read_manifest(root, head)
    want_rel = {
        e["path"]: {"size": int(e["bytes"]), "rows": int(e["rows"])}
        for e in hm["files"]
    }
    snap = delta_log_snapshot(root)
    got = {
        p: {"size": v["size"], "rows": v["numRecords"]} for p, v in snap["files"].items()
    }
    assert got == want_rel, ("delta-head-after-vacuum", root)
    ice = iceberg_snapshot(root)
    want_abs = {
        f"{location}/{p}": {"size": v["size"], "records": v["rows"]}
        for p, v in want_rel.items()
    }
    assert ice["files"] == want_abs, ("iceberg-head-after-vacuum", root)


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--merge-min":
        # drive the Iceberg manifest-merge path inside random sequences
        # (the default threshold of 100 is never reached by short ones)
        from devcontainers_etl_node_spark.sinks import iceberg_export

        iceberg_export._MANIFEST_MERGE_MIN = int(argv[1])
        argv = argv[2:]
    n_seq = int(argv[0]) if argv else 200
    n_ops = int(argv[1]) if len(argv) > 1 else 6
    from devcontainers_etl_node_spark.session import get_spark

    spark = get_spark()
    base = tempfile.mkdtemp(prefix="export-modelcheck-")
    total_ops = 0
    try:
        for i in range(n_seq):
            total_ops += check_sequence(spark, base, seed=1000 + i, n_ops=n_ops)
            if (i + 1) % 20 == 0:
                print(f"sequences {i + 1}/{n_seq} OK ({total_ops} exported commits)")
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(
        f"MODELCHECK OK: {n_seq} sequences, {total_ops} exported commits, "
        f"both formats, zero divergence"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
