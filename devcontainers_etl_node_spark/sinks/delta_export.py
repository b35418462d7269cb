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

from devcontainers_etl_node_spark.sinks.txlog import (
    _manifest_path,
    _read_manifest,
    tx_head,
)

_DELTA_LOG = "_delta_log"
# exporter bookkeeping, ignored by Delta readers (commit files are
# %020d.json — the dotted name never matches): maps the exported log to
# the txlog versions it covers so re-export can APPEND new commits
# instead of rebuilding O(history) every call (the streaming sink calls
# this once per micro-batch)
_EXPORT_MARKER = ".txlog_export.json"
# deterministic table-id namespace: re-exports of the same root keep the
# same Delta table id (readers treat an id change as a different table)
_TABLE_ID_NS = uuid.UUID("00000000-0000-0000-0000-0000000de17a")


def _split_top(s: str) -> list[str]:
    """Split a simpleString type-argument list on depth-0 commas.

    Depth counts BOTH angle brackets and parentheses: a decimal(p,s)
    nested inside struct<>/map<> carries a comma inside its parens that
    must not split the field list (struct<a:decimal(10,2),b:int>)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
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


def _commit_actions(
    root: str,
    m: dict,
    first: bool,
    prev_files: dict[str, dict],
    prev_txns: dict[str, int],
    prev_schema: dict | None,
) -> list[dict]:
    """Translate ONE txlog manifest into the Delta action list for its
    commit, diffed against the previous manifest's state (mode-agnostic —
    append/overwrite/merge/restore all reduce to set arithmetic on
    immutable file paths)."""
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
    if first:
        actions.append({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
    if first or m.get("schema") != prev_schema:
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
    return actions


def _write_lines_atomic(path: str, actions: list[dict]) -> None:
    """Commit files appear atomically: readers tailing the log never see
    a half-written JSONL (write sidecar, fsync, rename into place)."""
    tmp = path + ".inprogress"
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _manifest_state(m: dict) -> tuple[dict, dict, dict | None]:
    files = {e["path"]: e for e in m["files"]}
    txns = {a: int(b) for a, b in (m.get("txns") or {}).items()}
    return files, txns, m.get("schema")


def tx_export_delta(root: str) -> list[str]:
    """Write ``root/_delta_log/`` translating the retained txlog history
    into Delta commits; returns the log paths written by THIS call.

    Commit i of the Delta log corresponds to the i-th RETAINED manifest
    (vacuum may have dropped a prefix; Delta versions are renumbered from
    0, with the first commit carrying the full snapshot as adds — the
    same shape as a Delta checkpoint boundary).  Per commit:

    - ``add`` / ``remove``: the file-list diff against the previous
      retained manifest.  ``add`` carries ``stats`` with numRecords from
      the manifest's footer count.
    - ``metaData``: first commit, and again whenever the committed schema
      changes (Delta's schema-evolution signal).
    - ``txn``: one per app whose high-water mark changed — the carried
      txns map translates directly to Delta setTransaction actions, so
      idempotent writers survive the format hop.
    - ``commitInfo``: operation tag + commit timestamp.

    Re-export is INCREMENTAL (r11, was a full rebuild): a marker file
    records which txlog versions the existing log covers, and when the
    retained tail still starts at the recorded base (no vacuum since),
    only the commits past the exported head are appended — O(new
    commits) work per call, and each commit file lands by atomic rename,
    so a concurrent reader always sees a complete log (this is what
    makes ``txlog_sink(export=...)``'s per-micro-batch refresh O(batch)
    and glitch-free).  A vacuum that drops the renumbering base forces
    the full rebuild, which is staged in a sidecar directory and swapped
    in (the reader-visible gap is one rmtree+rename, not the whole
    rebuild).  Commit content is deterministic (manifest timestamps,
    uuid5 table id), so replaying an interrupted export rewrites
    identical bytes."""
    head = tx_head(root)
    if head is None:
        raise FileNotFoundError(f"no committed versions at {root}")

    log_dir = os.path.join(root, _DELTA_LOG)
    marker_path = os.path.join(log_dir, _EXPORT_MARKER)
    if os.path.exists(marker_path):
        with open(marker_path) as f:
            mk = json.load(f)
        base, exported = int(mk["base"]), int(mk["exported_head"])
        base_still_retained = os.path.exists(_manifest_path(root, base)) and (
            base == 0 or not os.path.exists(_manifest_path(root, base - 1))
        )
        last_file = os.path.join(log_dir, f"{exported - base:020d}.json")
        if base_still_retained and exported <= head and os.path.exists(last_file):
            if exported == head:
                return []
            prev_files, prev_txns, prev_schema = _manifest_state(
                _read_manifest(root, exported)
            )
            written: list[str] = []
            for v in range(exported + 1, head + 1):
                m = _read_manifest(root, v)
                actions = _commit_actions(
                    root, m, False, prev_files, prev_txns, prev_schema
                )
                path = os.path.join(log_dir, f"{v - base:020d}.json")
                _write_lines_atomic(path, actions)
                written.append(path)
                prev_files, prev_txns, prev_schema = _manifest_state(m)
                # marker after each commit: a crash loses at most the
                # in-flight file, and its bytes are deterministic anyway
                _write_lines_atomic(
                    marker_path, [{"base": base, "exported_head": v}]
                )
            return written

    # full (re)build: first export, or vacuum moved the renumbering base.
    # Stage into a sidecar and swap — the reader-visible window is the
    # rmtree+rename, not the whole translation.
    retained = []
    v = head
    while v >= 0:
        try:
            retained.append(_read_manifest(root, v))
        except FileNotFoundError:
            break
        v -= 1
    retained.reverse()
    base = head - len(retained) + 1

    # unique stage suffix (pid + random): two concurrent full rebuilds
    # each stage into their own sidecar instead of rmtree'ing each
    # other's in-progress files; the loser's rename fails cleanly.
    stage_dir = f"{log_dir}.staged-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    os.makedirs(stage_dir)

    written = []
    prev_files: dict[str, dict] = {}
    prev_txns: dict[str, int] = {}
    prev_schema: dict | None = None
    for i, m in enumerate(retained):
        actions = _commit_actions(root, m, i == 0, prev_files, prev_txns, prev_schema)
        path = os.path.join(stage_dir, f"{i:020d}.json")
        with open(path, "w") as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")
        written.append(os.path.join(log_dir, f"{i:020d}.json"))
        prev_files, prev_txns, prev_schema = _manifest_state(m)
    with open(os.path.join(stage_dir, _EXPORT_MARKER), "w") as f:
        json.dump({"base": base, "exported_head": head}, f)
    # swap order matters for crash safety: rename the OLD log aside
    # first, rename the stage in, delete the old tree LAST — a crash
    # between the two renames leaves a recoverable `.old-*` sidecar
    # (re-running the export rebuilds deterministically anyway), never
    # an rmtree'd table with no _delta_log until the next export.
    old_dir = None
    if os.path.exists(log_dir):
        old_dir = f"{log_dir}.old-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        os.rename(log_dir, old_dir)
    os.rename(stage_dir, log_dir)
    if old_dir is not None:
        shutil.rmtree(old_dir, ignore_errors=True)
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
