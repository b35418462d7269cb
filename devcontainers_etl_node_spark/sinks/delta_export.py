"""Delta Lake interop for the txlog table: export the manifest history
as a real ``_delta_log/`` so any Delta reader can open the table.

``sinks/txlog.py`` is protocol-compatible with Delta Lake in semantics
(atomic manifest commits, snapshot isolation, txnAppId/txnVersion
idempotence, CDF, vacuum) but uses its own manifest format.  This module
translates that history into the PUBLIC Delta Lake transaction-log
format (the open protocol: one JSONL file of single-action objects per
commit under ``_delta_log/%020d.json`` — protocol / metaData / add /
remove / txn / commitInfo actions), written next to the existing data
files, which never move: a txlog table becomes a Delta table in place,
O(manifest) driver-side work and zero data movement.

No Delta jars ship in this environment, so the Spark-side reader
(:func:`read_delta`) is gated behind a clear error; the exported log is
validated here by :func:`delta_log_snapshot`, an independent replay of
the action stream (the same reconstruction any Delta reader performs),
which tests pin equal to the txlog manifest.

Reference analogue: the reference hands transactional tables to
Postgres/ClickHouse (`src/etl/loaders.py:151-186`); the lakehouse
counterpart of "hand the table to another system" is exporting the open
table format.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from devcontainers_etl_node_spark.sinks.txlog import _read_manifest, tx_head

_DELTA_LOG = "_delta_log"
# deterministic table-id namespace: re-exports of the same root keep the
# same Delta table id (readers treat an id change as a different table)
_TABLE_ID_NS = uuid.UUID("00000000-0000-0000-0000-0000000de17a")


def _split_top(s: str) -> list[str]:
    """Split a simpleString type-argument list on depth-0 commas."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


_PRIMITIVE = {"bigint": "long", "int": "integer", "smallint": "short", "tinyint": "byte"}


def _delta_type(simple: str):
    """Spark ``simpleString`` -> Delta/Spark schema-JSON type node.
    Handles primitives (incl. decimal(p,s)), array<>, map<,>, struct<>."""
    s = simple.strip()
    if s.startswith("array<") and s.endswith(">"):
        return {
            "type": "array",
            "elementType": _delta_type(s[6:-1]),
            "containsNull": True,
        }
    if s.startswith("map<") and s.endswith(">"):
        k, v = _split_top(s[4:-1])
        return {
            "type": "map",
            "keyType": _delta_type(k),
            "valueType": _delta_type(v),
            "valueContainsNull": True,
        }
    if s.startswith("struct<") and s.endswith(">"):
        fields = []
        for part in _split_top(s[7:-1]):
            name, tp = part.split(":", 1)
            fields.append(
                {"name": name, "type": _delta_type(tp), "nullable": True, "metadata": {}}
            )
        return {"type": "struct", "fields": fields}
    return _PRIMITIVE.get(s, s)


def _schema_string(schema: dict) -> str:
    """Manifest schema (ordered name->simpleString) -> Delta schemaString
    (the Spark StructType JSON every Delta reader parses)."""
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": n, "type": _delta_type(t), "nullable": True, "metadata": {}}
                for n, t in (schema or {}).items()
            ],
        }
    )


def tx_export_delta(root: str) -> list[str]:
    """Write ``root/_delta_log/`` translating the retained txlog history
    into Delta commits; returns the written log paths.

    Commit i of the Delta log corresponds to the i-th RETAINED manifest
    (vacuum may have dropped a prefix; Delta versions are renumbered from
    0, with the first commit carrying the full snapshot as adds — the
    same shape as a Delta checkpoint boundary).  Per commit:

    - ``add`` / ``remove``: the file-list diff against the previous
      retained manifest (mode-agnostic — append/overwrite/merge/restore
      all reduce to set arithmetic on immutable file paths).  ``add``
      carries ``stats`` with numRecords from the manifest's footer count.
    - ``metaData``: first commit, and again whenever the committed schema
      changes (Delta's schema-evolution signal).
    - ``txn``: one per app whose high-water mark changed — the carried
      txns map translates directly to Delta setTransaction actions, so
      idempotent writers survive the format hop.
    - ``commitInfo``: operation tag + commit timestamp.

    Re-export is idempotent: the log directory is rebuilt from scratch
    (data files are never touched)."""
    head = tx_head(root)
    if head is None:
        raise FileNotFoundError(f"no committed versions at {root}")
    retained = []
    v = head
    while v >= 0:
        try:
            retained.append(_read_manifest(root, v))
        except FileNotFoundError:
            break
        v -= 1
    retained.reverse()

    log_dir = os.path.join(root, _DELTA_LOG)
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir)

    written: list[str] = []
    prev_files: dict[str, dict] = {}
    prev_txns: dict[str, int] = {}
    prev_schema: dict | None = None
    for i, m in enumerate(retained):
        ts = int(float(m.get("committed_at") or 0) * 1000)
        actions: list[dict] = [
            {
                "commitInfo": {
                    "timestamp": ts,
                    "operation": (m.get("operation") or m["mode"]).upper(),
                    "operationParameters": {},
                    "engineInfo": "devcontainers_etl_node_spark-txlog-export",
                }
            }
        ]
        if i == 0:
            actions.append({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
        if i == 0 or m.get("schema") != prev_schema:
            actions.append(
                {
                    "metaData": {
                        "id": str(uuid.uuid5(_TABLE_ID_NS, os.path.abspath(root))),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": _schema_string(m.get("schema")),
                        "partitionColumns": [],
                        "configuration": {},
                        "createdTime": ts,
                    }
                }
            )
        cur = {e["path"]: e for e in m["files"]}
        for p in sorted(set(prev_files) - set(cur)):
            actions.append(
                {"remove": {"path": p, "deletionTimestamp": ts, "dataChange": True}}
            )
        for p in sorted(set(cur) - set(prev_files)):
            e = cur[p]
            actions.append(
                {
                    "add": {
                        "path": p,
                        "partitionValues": {},
                        "size": int(e["bytes"]),
                        "modificationTime": ts,
                        "dataChange": True,
                        "stats": json.dumps({"numRecords": int(e["rows"])}),
                    }
                }
            )
        for app, bid in sorted((m.get("txns") or {}).items()):
            if prev_txns.get(app) != int(bid):
                actions.append(
                    {"txn": {"appId": app, "version": int(bid), "lastUpdated": ts}}
                )
        path = os.path.join(log_dir, f"{i:020d}.json")
        with open(path, "w") as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")
        written.append(path)
        prev_files, prev_txns = cur, {a: int(b) for a, b in (m.get("txns") or {}).items()}
        prev_schema = m.get("schema")
    return written


def delta_log_snapshot(root: str) -> dict:
    """Independent replay of ``root/_delta_log`` — the reconstruction any
    Delta reader performs: returns the head snapshot as
    ``{"files": {path: {"size", "numRecords"}}, "schema": <json dict>,
    "txns": {appId: version}, "version": N}``.  Shares no state with the
    exporter beyond the on-disk log, so a test pinning this equal to the
    txlog manifest is a real round-trip check."""
    log_dir = os.path.join(root, _DELTA_LOG)
    commits = sorted(
        fn for fn in os.listdir(log_dir) if fn.endswith(".json") and fn[:-5].isdigit()
    )
    if not commits:
        raise FileNotFoundError(f"no commits under {log_dir}")
    files: dict[str, dict] = {}
    schema = None
    txns: dict[str, int] = {}
    for fn in commits:
        with open(os.path.join(log_dir, fn)) as f:
            for line in f:
                if not line.strip():
                    continue
                a = json.loads(line)
                if "add" in a:
                    add = a["add"]
                    rec = {"size": add["size"]}
                    if add.get("stats"):
                        rec["numRecords"] = json.loads(add["stats"]).get("numRecords")
                    files[add["path"]] = rec
                elif "remove" in a:
                    files.pop(a["remove"]["path"], None)
                elif "metaData" in a:
                    schema = json.loads(a["metaData"]["schemaString"])
                elif "txn" in a:
                    t = a["txn"]
                    txns[t["appId"]] = max(txns.get(t["appId"], -1), int(t["version"]))
    return {
        "files": files,
        "schema": schema,
        "txns": txns,
        "version": int(commits[-1][:-5]),
    }


def read_delta(spark, root: str):
    """Open the exported table through Spark's Delta data source — gated:
    this environment ships no Delta jars, so the attempt is translated
    into a clear, actionable error instead of an opaque classpath
    failure.  The moment a runtime has delta-spark (pip) or
    ``--packages io.delta:delta-spark_2.13:<ver>``, this call works
    unchanged against the same exported log."""
    try:
        return spark.read.format("delta").load(root)
    except Exception as e:  # DATA_SOURCE_NOT_FOUND / ClassNotFound
        raise RuntimeError(
            f"the Delta Lake runtime is not on this cluster's classpath, so "
            f"Spark cannot open {root} as format('delta'). The exported "
            f"_delta_log is standard Delta protocol: add delta-spark (pip) "
            f"or --packages io.delta:delta-spark_2.13:<version> and re-run; "
            f"to validate the export without the runtime, use "
            f"delta_log_snapshot({root!r})."
        ) from e
