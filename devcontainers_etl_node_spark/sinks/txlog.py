"""Transactional manifest table — Delta-style ACID semantics in pure
PySpark + parquet, no external jars.

The reference's loaders append to ClickHouse/Postgres, which gives its
users transactional visibility for free (`src/etl/loaders.py:151-186`);
a parquet directory gives none: readers list files mid-write, see half
a batch, and a crashed writer leaves orphans that look like data. At
100 TB the fix is the lakehouse transaction-log design (Delta Lake,
Iceberg — public architecture): data files are immutable and
uniquely named, and a tiny versioned MANIFEST is the single source of
truth for which files ARE the table.

Semantics provided:

- **Atomic commits**: a writer stages parquet under ``root/data/`` with
  a UUID prefix (invisible to readers until referenced), then publishes
  ``root/_txlog/vN.json`` via create-exclusive — the commit IS the
  manifest write; a crash before it leaves only unreferenced files.
- **Snapshot isolation / time travel**: ``tx_read(..., version=K)``
  plans the scan from manifest K's explicit file list (never a
  directory listing), so a query sees one immutable version end-to-end
  regardless of concurrent appends/overwrites — and version K stays
  readable until vacuumed.
- **Optimistic concurrency**: two appends racing for vN — exactly one
  wins the create-exclusive; the loser re-reads the new head and
  rebases (its files are disjoint by construction, so an append rebase
  is always safe). An overwrite that lost a race FAILS (its snapshot
  basis is stale) — the caller retries at the new head, same rule
  Delta applies.
- **Incremental scans (CDF-lite)**: ``tx_changes(since_version)``
  returns only rows appended or upserted after a version (merges are
  EXACT via recorded change files) — the feed the incremental
  dedup/curation pipelines consume so history is never re-scanned.
- **Compaction + vacuum**: ``tx_compact`` rewrites small files into a
  new version (readers of old versions unaffected; ``cluster_by`` sorts
  into range-disjoint files so skipping works); ``tx_vacuum`` deletes
  files unreferenced by the retained version window AND older than a
  retention grace period (in-flight writers protected).
- **Data skipping**: manifests carry per-file integral/boolean zone
  maps read from parquet footers (floats excluded — parquet stats omit
  NaN while Spark orders NaN above every double, so a float zone map
  could prune rows a full scan would return; strings excluded — their
  stats may be truncated); ``tx_prune_files``/``tx_read_pruned`` plan
  range queries from the manifest alone (row-level filter still
  applied — stats shrink the scan, never decide correctness).
- **Schema contract + evolution**: every commit records the schema;
  drifted appends are rejected unless ``allow_schema_change=True``,
  which flips the snapshot to mergeSchema planning until a rewrite.
- **Exactly-once replayable writers**: ``tx_write_idempotent`` is the
  Delta txnAppId/txnVersion protocol; ``streaming.txlog_sink`` rides it
  for foreachBatch micro-batches.
- **Copy-on-write MERGE**: ``tx_merge`` upserts by key, rewriting ONLY
  the files whose zone maps can contain an update key (everything else
  carries into the new version verbatim) — Delta's matched-file
  rewrite; ``delete_col`` tombstones make it a full I/U/D changelog
  apply; a commit race fails loudly instead of rebasing, because a
  merge plan is only valid against the snapshot it pruned.
- **RESTORE**: ``tx_restore(version)`` rolls the table back to an
  earlier version's content as a new commit that re-references the old
  file list — zero data movement, recorded as an overwrite so change
  feeds and incremental cursors treat the rollback as the content
  replacement it is.

Scale notes: the manifest holds (path, rows, bytes) per file — ~100
bytes/file, so a 100 TB table at 500 MB/file is a ~20 MB manifest, read
once by the driver for planning (the same driver-side O(files) every
format pays) while executors never list directories.  Per-file ``rows``
comes from the parquet FOOTER (pyarrow metadata read, no Spark job) so
``tx_read`` callers can plan/skip on counts without scanning.  Manifest
publish is fsync-then-hardlink: the JSON is durably written to a temp
name first and only then linked to ``vN.json`` — the link is both the
atomicity point (a crash mid-write can never leave a truncated manifest
under the winning name) and the exclusivity point (``os.link`` fails
with EEXIST for the loser, the same contract conditional-PUT gives on
object stores).  Concurrency control is single-table, multi-writer,
last-committer-rebases — the Delta model, not two-phase commit.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG = "_txlog"
_DATA = "data"


class TxConflict(RuntimeError):
    """An overwrite lost the commit race: its snapshot basis is stale."""


#: sentinel for tx_write(expected_head=...): "don't check the basis"
UNCHECKED = "unchecked"


def _log_dir(root: str) -> str:
    return os.path.join(root, _LOG)


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(_log_dir(root), f"v{version:012d}.json")


def tx_head(root: str) -> int | None:
    """Latest committed version, or None for an empty/absent table.

    O(1) on the happy path (r11): commits leave an advisory HEAD.hint;
    it is trusted only when its manifest exists AND the next version
    does not (two stats) — a hint left one behind by a crash, or stale
    under a concurrent writer, fails the probe and falls back to the
    authoritative O(#manifests) listing.  This is what keeps the
    per-micro-batch export cost flat as history grows (the 1000-batch
    bench measured the listing as the Delta exporter's residual
    +11 us/batch slope)."""
    hint = os.path.join(_log_dir(root), "HEAD.hint")
    try:
        with open(hint) as f:
            v = int(f.read().strip())
        if os.path.exists(_manifest_path(root, v)) and not os.path.exists(
            _manifest_path(root, v + 1)
        ):
            return v
    except (OSError, ValueError):
        pass
    versions = [
        int(m.group(1))
        for p in glob.glob(os.path.join(_log_dir(root), "v*.json"))
        if (m := re.fullmatch(r"v(\d+)\.json", os.path.basename(p)))
    ]
    return max(versions) if versions else None


def _read_manifest(root: str, version: int) -> dict:
    with open(_manifest_path(root, version)) as f:
        return json.load(f)


def _stage_files(df: DataFrame, root: str) -> list[dict]:
    """Write df as immutable uniquely-prefixed parquet under root/data/
    via a scratch dir (Spark names files per-task; the txn-unique prefix
    comes from the scratch dir rename), return file entries."""
    txn = uuid.uuid4().hex[:16]
    scratch = os.path.join(root, _DATA, f".stage-{txn}")
    df.write.mode("overwrite").parquet(scratch)
    entries = []
    for fn in sorted(os.listdir(scratch)):
        if not fn.endswith(".parquet"):
            continue
        final = f"{txn}-{fn}"
        os.replace(os.path.join(scratch, fn), os.path.join(root, _DATA, final))
        full = os.path.join(root, _DATA, final)
        rows, stats = _parquet_footer_info(full)
        entry = {"path": f"{_DATA}/{final}", "bytes": os.path.getsize(full), "rows": rows}
        if stats:
            entry["stats"] = stats
        entries.append(entry)
    shutil.rmtree(scratch)
    return entries


def _parquet_footer_info(path: str) -> tuple[int, dict]:
    """Row count + per-column (min, max) zone maps from the parquet
    FOOTER — metadata only, no scan.  Stats cover INTEGRAL/boolean leaf
    columns only: parquet string statistics may be truncated (a
    truncated max understates the true max, which would make pruning
    unsound), and parquet float/double statistics EXCLUDE NaN while
    Spark's comparison semantics order NaN above every double — a float
    zone map could therefore prune a file whose NaN rows an unpruned
    scan's row filter would return.  Both are deliberately excluded and
    their files never pruned: soundness over coverage."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    exact: set[str] = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for j in range(g.num_columns):
            c = g.column(j)
            name = c.path_in_schema
            try:
                st = c.statistics
                has = st is not None and st.has_min_max
                lo, hi = (st.min, st.max) if has else (None, None)
            except Exception:  # pyarrow: "Cannot extract statistics" (map/...)
                has = False
            if not has:
                mins.pop(name, None)
                exact.discard(name)
                continue
            # bool passes (a subclass of int with no NaN); float fails
            if not (isinstance(lo, int) and isinstance(hi, int)):
                continue
            if rg == 0:
                mins[name], maxs[name] = lo, hi
                exact.add(name)
            elif name in exact:
                mins[name] = min(mins[name], lo)
                maxs[name] = max(maxs[name], hi)
    stats = {n: [mins[n], maxs[n]] for n in exact if n in mins}
    return md.num_rows, stats


def _try_commit(root: str, version: int, manifest: dict) -> bool:
    """Atomic-and-exclusive manifest publish: exactly one writer wins vN,
    and no crash can leave a truncated vN.json under the winning name.
    The JSON streams to a writer-unique temp file (flush + fsync), then
    publishes via ``os.link(tmp, final)`` — the hardlink either fully
    exposes the durable bytes or raises FileExistsError for the loser."""
    path = _manifest_path(root, version)
    tmp = f"{path}.inprogress.{uuid.uuid4().hex[:12]}"
    try:
        with open(tmp, "x") as f:
            # NOT sort_keys: the manifest's "schema" dict is ORDERED (the
            # committed column order _conform restores on read) — sorting
            # would alphabetize it through the JSON round-trip and silently
            # reorder every table's columns. Construction is deterministic,
            # so the bytes are reproducible without sorting.
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError:
            return False
        # O(1) head hint for tx_head (advisory, never authoritative):
        # written AFTER the winning link, atomically; a crash between
        # link and hint leaves it one behind, which tx_head's existence
        # probe detects before trusting it
        hint_tmp = os.path.join(_log_dir(root), f".head.{uuid.uuid4().hex[:12]}")
        try:
            with open(hint_tmp, "w") as hf:
                hf.write(str(version))
                hf.flush()
                os.fsync(hf.fileno())
            os.replace(hint_tmp, os.path.join(_log_dir(root), "HEAD.hint"))
        except OSError:
            try:
                os.unlink(hint_tmp)
            except OSError:
                pass
        return True
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass


def _carry_txns(prev: dict | None, meta: dict | None) -> dict:
    """Per-app idempotence high-water marks, carried forward into EVERY
    manifest (Delta's setTransaction state surviving via checkpoints):
    :func:`tx_txn_version` reads only the HEAD manifest, so vacuuming old
    manifests can never lose the state that makes
    :func:`tx_write_idempotent` exactly-once.  Without the carry, a
    multi-writer table could push an app's last commit out of the vacuum
    window and a crash-replay of that app would re-append its batch."""
    txns = dict((prev or {}).get("txns") or {})
    if meta and meta.get("txn_app_id") is not None:
        app = str(meta["txn_app_id"])
        txns[app] = max(int(txns.get(app, -1)), int(meta.get("txn_batch_id", -1)))
    return txns


def tx_write(
    df: DataFrame,
    root: str,
    mode: str = "append",
    expected_head: int | None | str = UNCHECKED,
    operation: str | None = None,
    max_retries: int = 20,
    meta: dict | None = None,
    allow_schema_change: bool = False,
) -> int:
    """Commit ``df`` to the table at ``root``; returns the new version.

    ``mode="append"`` adds files to the current snapshot; a lost commit
    race rebases automatically (append file sets are disjoint, so rebase
    is always safe).  ``mode="overwrite"`` replaces the table content;
    pass ``expected_head`` (the version your decision was based on — use
    ``tx_head(root)``) to get the stale-basis check: if someone else
    committed past it, :class:`TxConflict` is raised instead of silently
    clobbering their rows.  ``expected_head`` defaults to unchecked for
    blind overwrites (truncate-and-load semantics).  ``meta`` is an
    optional caller-owned JSON dict recorded in the manifest (stage
    parameters, input fingerprints — read back via :func:`tx_meta`).

    Schema contract: every commit records the DataFrame schema; an
    append whose schema differs from the committed one is REJECTED —
    Spark silently takes one file's schema for a mixed-schema parquet
    scan, so an unguarded drifted append corrupts every later read.
    Pass ``allow_schema_change=True`` to evolve intentionally: the
    manifest then carries ``schema_evolved`` and :func:`tx_read` plans
    that snapshot with ``mergeSchema`` (old files' missing columns read
    as NULL, Delta's evolution semantics); a later overwrite/compact
    resets the flag."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append or overwrite, got {mode!r}")
    os.makedirs(os.path.join(root, _DATA), exist_ok=True)
    os.makedirs(_log_dir(root), exist_ok=True)
    schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    added = _stage_files(df, root)

    for _ in range(max_retries):
        head = tx_head(root)
        if (
            mode == "overwrite"
            and expected_head != UNCHECKED
            and head != expected_head
        ):
            raise TxConflict(
                f"overwrite based on v{expected_head} but head is v{head}"
            )
        next_v = 0 if head is None else head + 1
        evolved = False
        prev = _read_manifest(root, head) if head is not None else None
        if mode == "append" and prev is not None:
            files = prev["files"] + added
            prev_schema = prev.get("schema")
            changed = prev_schema is not None and prev_schema != schema
            if changed and not allow_schema_change:
                diff = [
                    f"{n}: {prev_schema.get(n, '<absent>')} -> {schema.get(n, '<absent>')}"
                    for n in sorted(set(schema) | set(prev_schema))
                    if schema.get(n) != prev_schema.get(n)
                ]
                raise ValueError(
                    f"append schema differs from the committed table schema "
                    f"at {root} ({'; '.join(diff)}) — pass "
                    f"allow_schema_change=True to evolve, or conform the "
                    f"batch first"
                )
            # evolution is sticky across appends until a full rewrite:
            # the snapshot mixes file schemas until overwrite/compact
            evolved = changed or bool(prev.get("schema_evolved"))
        else:
            files = added
        manifest = {
            "version": next_v,
            "mode": mode,
            "operation": operation,
            "added": [e["path"] for e in added],
            "files": files,
            "schema": schema,
            "committed_at": time.time(),
            "txns": _carry_txns(prev, meta),
        }
        if evolved:
            manifest["schema_evolved"] = True
        if meta is not None:
            manifest["meta"] = meta
        if _try_commit(root, next_v, manifest):
            return next_v
        # lost the race: append rebases onto the new head; overwrite
        # loops back to the stale-basis check above (unchecked blind
        # overwrite rebases too — truncate semantics don't care)
    raise TxConflict(f"gave up after {max_retries} commit races at {root}")


def tx_read(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Snapshot read: plan the scan from the manifest's explicit file
    list — an immutable version, never a directory listing.  ``version``
    time-travels; default is the current head."""
    head = tx_head(root)
    if head is None:
        raise FileNotFoundError(f"no committed versions at {root}")
    v = head if version is None else version
    manifest = _read_manifest(root, v)
    paths = [os.path.join(root, e["path"]) for e in manifest["files"]]
    if not paths:
        raise ValueError(f"v{v} at {root} is an empty snapshot")
    reader = spark.read
    if manifest.get("schema_evolved"):
        # the snapshot mixes file schemas (an allowed evolution): merge
        # footers so old files surface the new columns as NULL
        reader = reader.option("mergeSchema", "true")
    return _conform(reader.parquet(*paths), manifest)


def _conform(df: DataFrame, manifest: dict) -> DataFrame:
    """Project a snapshot scan to the COMMITTED table schema: reads are
    defined by the manifest, not by whichever files a plan happened to
    touch — columns an evolution dropped disappear, columns the scanned
    files lack surface as typed NULLs, order is the committed order.
    No-op (and no plan noise) when the files already match."""
    schema = manifest.get("schema")
    if not schema or [f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields] == [
        f"{n}:{t}" for n, t in schema.items()
    ]:
        return df
    from pyspark.sql import functions as F

    return df.select(
        *[
            (F.col(n) if n in df.columns else F.lit(None)).cast(t).alias(n)
            for n, t in schema.items()
        ]
    )


def tx_prune_files(
    root: str,
    col: str,
    lo: float | int | None = None,
    hi: float | int | None = None,
    version: int | None = None,
) -> list[str]:
    """Manifest-level DATA SKIPPING: the relative paths of the snapshot's
    files whose footer zone map for ``col`` intersects ``[lo, hi]``
    (either bound may be None = unbounded).  Files with no recorded
    stats for ``col`` are always kept — pruning is sound, never
    heuristic.  NULLs are not represented in parquet zone maps, so a
    pruned-away file can still hold NULL-keyed rows — consistent with
    :func:`tx_read_pruned`, whose BETWEEN filter drops NULLs anyway;
    callers doing their own logic over the pruned list must not expect
    NULL rows.  Pure driver-side manifest arithmetic: at 100 TB this
    turns a point/range query over a clustered column into a scan of a
    handful of files without touching the others' footers, the same
    mechanism as Delta/Iceberg file skipping."""
    head = tx_head(root)
    if head is None:
        raise FileNotFoundError(f"no committed versions at {root}")
    v = head if version is None else version
    keep = []
    for e in _read_manifest(root, v)["files"]:
        rng = (e.get("stats") or {}).get(col)
        if rng is not None:
            fmin, fmax = rng
            if (hi is not None and fmin > hi) or (lo is not None and fmax < lo):
                continue
        keep.append(e["path"])
    return keep


def tx_read_pruned(
    spark: SparkSession,
    root: str,
    col: str,
    lo: float | int | None = None,
    hi: float | int | None = None,
    version: int | None = None,
) -> DataFrame:
    """Snapshot read restricted to ``col BETWEEN lo AND hi``: the file
    list is pruned by the manifest zone maps (:func:`tx_prune_files`),
    then the predicate is STILL applied row-level — correctness never
    depends on the stats, they only shrink the scan."""
    paths = tx_prune_files(root, col, lo, hi, version)
    if not paths:
        return tx_read(spark, root, version).filter("1 = 0")
    head = tx_head(root)
    manifest = _read_manifest(root, head if version is None else version)
    reader = spark.read
    if manifest.get("schema_evolved"):
        # same rule as tx_read: an evolved snapshot mixes file schemas,
        # and a non-merged read of a pruned subset would silently take
        # one file's schema
        reader = reader.option("mergeSchema", "true")
    df = _conform(reader.parquet(*[os.path.join(root, p) for p in paths]), manifest)
    from pyspark.sql import functions as F

    if lo is not None:
        df = df.filter(F.col(col) >= F.lit(lo))
    if hi is not None:
        df = df.filter(F.col(col) <= F.lit(hi))
    return df


def tx_txn_version(root: str, app_id: str) -> int:
    """Highest batch id committed under ``app_id`` (the Delta
    txnAppId/txnVersion idempotence protocol), or -1.  O(1): every
    manifest carries the per-app high-water map forward
    (:func:`_carry_txns`), so only the HEAD manifest is read — and
    vacuuming old manifests can never lose idempotence state, even on a
    multi-writer table whose other writers push an app's last commit out
    of the retained window.  Legacy manifests (no ``txns`` key) fall back
    to the O(versions) scan, which skips vacuumed manifests and can
    therefore under-report — the carried map exists to close that hole."""
    head = tx_head(root)
    if head is None:
        return -1
    hm = _read_manifest(root, head)
    if "txns" in hm:
        return int((hm["txns"] or {}).get(app_id, -1))
    best = -1
    for v in range(head + 1):
        try:
            meta = _read_manifest(root, v).get("meta") or {}
        except FileNotFoundError:
            continue
        if meta.get("txn_app_id") == app_id:
            best = max(best, int(meta.get("txn_batch_id", -1)))
    return best


def tx_write_idempotent(
    df: DataFrame,
    root: str,
    app_id: str,
    batch_id: int,
    operation: str | None = None,
    extra_meta: dict | None = None,
) -> int | None:
    """Exactly-once append for REPLAYABLE writers (streaming
    foreachBatch): when ``(app_id, batch_id)`` is already committed the
    write is skipped and None returned, so a micro-batch replayed after
    a crash lands exactly once.  Assumes one active writer per app_id —
    Structured Streaming's checkpoint lock guarantees exactly that for
    a foreachBatch caller."""
    if batch_id <= tx_txn_version(root, app_id):
        return None
    meta = {"txn_app_id": app_id, "txn_batch_id": int(batch_id)}
    if extra_meta:
        meta.update(extra_meta)
    return tx_write(df, root, mode="append", operation=operation, meta=meta)


def tx_meta(root: str, version: int | None = None) -> dict | None:
    """The caller-owned ``meta`` dict recorded at commit time (or None)."""
    head = tx_head(root)
    if head is None:
        raise FileNotFoundError(f"no committed versions at {root}")
    return _read_manifest(root, head if version is None else version).get("meta")


def tx_stats(root: str, version: int | None = None) -> dict:
    """Σ rows / Σ bytes over a committed version's live files — driver-side
    manifest arithmetic, ZERO Spark jobs (the manifest records per-file
    (path, rows, bytes) at commit time). This is what lets pipeline entry
    points size their partition geometry (``minhash_partition_plan``) from
    a staged table for free instead of paying a count job per run.
    Returns ``{"rows": int, "bytes": int}``."""
    head = tx_head(root)
    if head is None:
        raise FileNotFoundError(f"no committed versions at {root}")
    m = _read_manifest(root, head if version is None else version)
    return {
        "rows": sum(e["rows"] for e in m["files"]),
        "bytes": sum(e["bytes"] for e in m["files"]),
    }


def tx_history(root: str, since_version: int = -1) -> list[dict]:
    """Commit metadata for versions in ``(since_version, head]`` —
    (version, mode, operation) per manifest, oldest first.  Driver-side
    O(versions) planning data, never row data; raises the same
    vacuumed-history error as :func:`tx_changes`."""
    head = tx_head(root)
    if head is None:
        return []
    out = []
    for v in range(since_version + 1, head + 1):
        try:
            m = _read_manifest(root, v)
        except FileNotFoundError:
            raise ValueError(
                f"history before v{v + 1} at {root} has been vacuumed — "
                f"re-read the full snapshot (tx_read) and reset the cursor "
                f"to v{head}"
            ) from None
        out.append(
            {"version": v, "mode": m["mode"], "operation": m.get("operation")}
        )
    return out


def tx_changes(
    spark: SparkSession, root: str, since_version: int, exact: bool = True
) -> DataFrame:
    """Incremental scan (CDF-lite): the rows APPENDED OR UPSERTED by
    versions (since_version, head], each at its LATEST committed value —
    the feed incremental dedup consumes.  An intervening overwrite resets
    history, so its snapshot is returned whole (everything after it is
    'new').

    Merges are EXACT, not at-least-once: a merge commit records its raw
    changelog batch as ``change_files`` (O(changelog) extra bytes), so
    the feed emits exactly the upserted rows — never the survivors a
    rewrite re-staged from files committed before the cursor.  Rows the
    cursor window appended that a later merge then updated appear ONCE,
    post-image only; rows it appended that a later merge deleted do not
    appear (they no longer exist — a new-docs consumer must not ingest
    them).  Mechanically this is a fold: appended files accumulate, each
    merge anti-joins the accumulated feed on its recorded ``merge_key``
    against the changelog's keys and unions the changelog's non-tombstone
    rows.  The anti-join is bounded by the changelog (broadcast-sized in
    practice), and a pure-append window still plans as ONE parquet scan
    of the added files — the fold only materializes joins when a merge
    is actually in the window.

    ``exact=False`` is the migration path for tables whose history holds
    merges committed BEFORE change-file recording existed (pre-r10): a
    legacy merge then contributes its rewritten files whole — the
    pre-r10 AT-LEAST-ONCE behavior, which can re-deliver survivor rows
    the merge re-staged from files committed before the cursor.
    Consumers opting in must dedup on their own key.  With the default
    ``exact=True`` such a window raises with a reset recipe instead of
    silently over-delivering; merges that DID record change files stay
    exact under either flag."""
    head = tx_head(root)
    if head is None or since_version > head:
        raise ValueError(f"since_version v{since_version} vs head {head}")
    from pyspark.sql import functions as F

    acc: DataFrame | None = None
    paths: list[str] = []

    def fold_paths() -> None:
        nonlocal acc, paths
        if paths:
            df = spark.read.parquet(*paths)
            acc = df if acc is None else acc.unionByName(df, allowMissingColumns=True)
            paths = []

    for v in range(since_version + 1, head + 1):
        try:
            m = _read_manifest(root, v)
        except FileNotFoundError:
            raise ValueError(
                f"history before v{v + 1} at {root} has been vacuumed — "
                f"incremental read from v{since_version} is impossible; "
                f"re-read the full snapshot (tx_read) and reset the cursor "
                f"to v{head}"
            ) from None
        if m["mode"] == "overwrite":
            paths = [os.path.join(root, e["path"]) for e in m["files"]]
            acc = None
        elif m["mode"] == "merge":
            cf = m.get("change_files")
            if cf is None:
                if not exact:
                    # legacy at-least-once fold: the merge's rewritten
                    # files re-deliver survivors alongside the true
                    # upserts (documented in the exact=False contract)
                    paths += [os.path.join(root, p) for p in m["added"]]
                    continue
                raise ValueError(
                    f"merge at v{v} of {root} predates change-file "
                    f"recording — an exact feed across it is impossible; "
                    f"re-read the full snapshot (tx_read) and reset the "
                    f"cursor to v{head}, or pass exact=False to accept "
                    f"the pre-r10 at-least-once feed (survivor rows may "
                    f"re-deliver; dedup on your key)"
                )
            key = m["merge_key"]
            raw = spark.read.parquet(*[os.path.join(root, p) for p in cf])
            fold_paths()
            if acc is not None:
                # keys this merge touched (upserts AND deletes) supersede
                # any earlier appearance in the window's feed
                acc = acc.join(raw.select(key), key, "left_anti")
            dcol = m.get("change_delete_col")
            ups = (
                raw.filter(~F.coalesce(F.col(dcol), F.lit(False))).drop(dcol)
                if dcol
                else raw
            )
            ups = _conform(ups, m)
            acc = ups if acc is None else acc.unionByName(ups, allowMissingColumns=True)
        else:
            paths += [os.path.join(root, p) for p in m["added"]]
    fold_paths()
    if acc is None:
        return tx_read(spark, root, head).limit(0)
    return acc


def tx_compact(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: list[str] | None = None,
) -> int:
    """Rewrite the head snapshot into ~target-sized files and commit it
    as a new version (operation='compact').  Readers pinned to older
    versions are untouched — their files stay on disk until vacuum.
    Cost model is compact_small_files' (sinks/files.py): one shuffle-free
    coalesce sized from live bytes.

    ``cluster_by`` trades that shuffle-free pass for a range
    repartition + within-file sort on the given columns — after which
    each file's zone map for those columns is a NARROW disjoint range,
    so :func:`tx_prune_files` point/range queries plan O(1) files
    instead of all of them.  This is the maintenance operation that
    makes data skipping effective (Delta OPTIMIZE ZORDER's 1-D case)."""
    head = tx_head(root)
    if head is None:
        raise FileNotFoundError(f"no committed versions at {root}")
    manifest = _read_manifest(root, head)
    live_bytes = sum(e["bytes"] for e in manifest["files"])
    n_out = max(1, round(live_bytes / target_file_bytes))
    df = tx_read(spark, root, head)
    if cluster_by:
        df = df.repartitionByRange(n_out, *cluster_by).sortWithinPartitions(*cluster_by)
    else:
        df = df.coalesce(n_out)
    return tx_write(
        df, root, mode="overwrite", expected_head=head, operation="compact"
    )


def tx_vacuum(
    root: str, keep_last: int = 2, retention_hours: float = 24.0
) -> list[str]:
    """Delete data files unreferenced by the last ``keep_last`` versions
    (and stale stage scratch), plus older manifests.  Returns deleted
    paths.  Never touches files any retained version references — time
    travel within the window survives vacuum, merge CDF change files of
    retained versions survive, and idempotence state ALWAYS survives:
    per-app txn high-water marks are carried forward into every manifest
    (:func:`_carry_txns`), so deleting old manifests cannot make
    :func:`tx_write_idempotent` re-append a vacuumed app's batch.

    ``retention_hours`` is the in-flight-writer grace window (Delta's
    vacuum retention check): an unreferenced file or ``.stage-*`` dir
    younger than the threshold may belong to a writer between
    ``_stage_files`` and commit — deleting it would let that writer
    publish a manifest referencing dead files (a corrupted snapshot).
    Only age-passed orphans are reclaimed; pass ``retention_hours=0``
    ONLY when no writer can be in flight (tests, single-process jobs)."""
    head = tx_head(root)
    if head is None:
        return []
    cutoff = time.time() - retention_hours * 3600.0
    keep_versions = [v for v in range(head - keep_last + 1, head + 1) if v >= 0]
    referenced = set()
    for v in keep_versions:
        m = _read_manifest(root, v)
        for e in m["files"]:
            referenced.add(e["path"])
        # a retained merge manifest's CDF change files must survive too —
        # tx_changes across that merge reads them
        referenced.update(m.get("change_files") or [])
    deleted = []
    data_dir = os.path.join(root, _DATA)
    for fn in sorted(os.listdir(data_dir)):
        full = os.path.join(data_dir, fn)
        try:
            age_ok = os.path.getmtime(full) <= cutoff
        except OSError:
            continue  # raced with its writer's own rename/cleanup
        if not age_ok:
            continue
        if fn.startswith(".stage-"):
            shutil.rmtree(full, ignore_errors=True)
            deleted.append(f"{_DATA}/{fn}")
        elif f"{_DATA}/{fn}" not in referenced and fn.endswith(".parquet"):
            os.remove(full)
            deleted.append(f"{_DATA}/{fn}")
    for p in glob.glob(os.path.join(_log_dir(root), "v*.json")):
        m = re.fullmatch(r"v(\d+)\.json", os.path.basename(p))
        if m and int(m.group(1)) not in keep_versions:
            os.remove(p)
            deleted.append(f"{_LOG}/{os.path.basename(p)}")
    return deleted


def _merge_inserts(updates: DataFrame, payload: DataFrame, delete_col: str | None) -> DataFrame:
    """The rows a merge INSERTS: everything when there are no tombstones,
    else the non-tombstoned rows with the flag column stripped (a NULL
    flag counts as not-deleted)."""
    if delete_col is None:
        return payload
    from pyspark.sql import functions as F

    return updates.filter(~F.coalesce(F.col(delete_col), F.lit(False))).drop(delete_col)


def tx_merge(
    spark: SparkSession,
    updates: DataFrame,
    root: str,
    key: str,
    expected_head: int | None | str = UNCHECKED,
    meta: dict | None = None,
    delete_col: str | None = None,
) -> int:
    """Copy-on-write MERGE (Delta ``MERGE INTO`` with update-all /
    insert-all semantics): rows of ``updates`` REPLACE same-``key``
    table rows; keys not in the table are inserted. Returns the new
    version.

    ``delete_col``: full I/U/D changelog apply — when given, ``updates``
    carries a boolean column and TRUE rows are tombstones: their keys
    are removed from the table and nothing is inserted (a tombstone for
    an absent key is a no-op, Delta's whenMatchedDelete semantics). The
    flag column is stripped before the schema check and the insert, so
    the table schema never sees it.

    The scale property is FILE PRUNING: only files whose manifest zone
    map for ``key`` can contain an update key are rewritten — every
    other file's manifest entry is carried into the new version
    verbatim, so a 10-row merge into a 100 TB table clustered on
    ``key`` rewrites a handful of files, not the table (Delta's
    matched-file rewrite, driven here by the same footer stats
    ``tx_prune_files`` uses). Files without recorded stats for ``key``
    are conservatively rewritten — pruning is sound, never heuristic.

    Contract: ``key`` must be unique and non-null in ``updates`` (a
    MERGE with duplicate source keys is ambiguous — Delta errors too;
    validated here with one small aggregate), and the updates schema
    must equal the committed table schema (merge does not evolve).
    Concurrency: the rewrite plan is only valid against the snapshot it
    was planned on, so a commit race raises :class:`TxConflict` instead
    of rebasing — the caller re-runs the merge against the new head
    (an append rebase would be UNSOUND here: the new head's files may
    contain matched keys the plan never rewrote).
    """
    head = tx_head(root)
    if head is None:
        raise FileNotFoundError(f"no committed versions at {root} — use tx_write")
    if expected_head != UNCHECKED and head != expected_head:
        raise TxConflict(f"merge planned against v{expected_head} but head is v{head}")
    manifest = _read_manifest(root, head)
    # schema check is metadata-only — derived inline from the un-pinned
    # frame; `payload` is bound exactly once, AFTER the checkpoint below,
    # so no stale un-pinned binding survives to be misused (r14 advice)
    schema = {
        f.name: f.dataType.simpleString()
        for f in (updates.drop(delete_col) if delete_col else updates).schema.fields
    }
    prev_schema = manifest.get("schema")
    if prev_schema is not None and prev_schema != schema:
        diff = [
            f"{n}: {prev_schema.get(n, '<absent>')} -> {schema.get(n, '<absent>')}"
            for n in sorted(set(schema) | set(prev_schema))
            if schema.get(n) != prev_schema.get(n)
        ]
        raise ValueError(
            f"merge updates schema differs from the table schema at {root} "
            f"({'; '.join(diff)}) — conform the batch first"
        )

    from pyspark.sql import functions as F

    # Compute the changelog ONCE (r14, guide §1.2/§5): the merge reads
    # `updates` from FOUR separate actions (key-contract aggregate, zone-map
    # prune semi-join, the rewrite's anti-join + inserts, and the CDF
    # change-file staging) — without a pin each action re-runs the caller's
    # whole changelog DAG, which at scale is routinely an expensive query
    # (a CDC feed with joins), not a cheap scan. The pin is an eager
    # localCheckpoint — O(changelog) executor-local bytes, the same bound
    # the change files already accept on disk — and also snapshots the
    # batch, so validation, pruning, rewrite and change files all commit
    # the SAME rows even if the source is non-deterministic.
    updates = updates.localCheckpoint(eager=True)
    payload = updates.drop(delete_col) if delete_col else updates

    # one small aggregate validates the source-key contract
    v = updates.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(key).alias("n_nonnull"),
        F.count_distinct(key).alias("n_distinct"),
    ).collect()[0]
    if v["n_nonnull"] != v["n"]:
        raise ValueError(f"merge key {key!r} contains NULLs — a NULL never matches")
    if v["n_distinct"] != v["n"]:
        raise ValueError(
            f"merge key {key!r} is not unique in the updates ({v['n']} rows, "
            f"{v['n_distinct']} keys) — ambiguous MERGE source"
        )

    # split the snapshot: files whose zone map CAN contain an update key
    # (or have no stats for the key) are rewritten; the rest carry over
    entries = manifest["files"]
    ranged = [
        (e["path"], e["stats"][key][0], e["stats"][key][1])
        for e in entries
        if (e.get("stats") or {}).get(key) is not None
    ]
    touched = {e["path"] for e in entries if (e.get("stats") or {}).get(key) is None}
    if ranged:
        integral = updates.schema[key].dataType.simpleString() in (
            "tinyint", "smallint", "int", "bigint"
        )
        # LONG bounds for integral keys: a double zone map would lose
        # exactness past 2^53 and make pruning unsound
        rtype = "BIGINT" if integral else "DOUBLE"
        rdf = spark.createDataFrame(
            ranged, f"path STRING, lo {rtype}, hi {rtype}"
        )
        hit = (
            rdf.join(
                updates.select(F.col(key).alias("_k")),
                (F.col("_k") >= F.col("lo")) & (F.col("_k") <= F.col("hi")),
                "left_semi",
            )
            .select("path")
            .collect()
        )
        touched.update(r["path"] for r in hit)

    untouched_entries = [e for e in entries if e["path"] not in touched]

    if touched:
        reader = spark.read
        if manifest.get("schema_evolved"):
            reader = reader.option("mergeSchema", "true")
        old = _conform(
            reader.parquet(*[os.path.join(root, p) for p in sorted(touched)]),
            manifest,
        )
        # survivors lose EVERY update key — upserted keys are re-inserted
        # from the batch, tombstoned keys are simply gone
        survivors = old.join(updates.select(key), key, "left_anti")
        new_data = survivors.unionByName(_merge_inserts(updates, payload, delete_col))
    else:
        # pure insert: no table file can match; tombstones are no-ops
        new_data = _merge_inserts(updates, payload, delete_col)
    added = _stage_files(new_data, root)
    # CDF change files: the raw changelog batch (tombstone flag kept) is
    # staged alongside the rewrite so tx_changes can emit EXACTLY the
    # upserted rows instead of every added file (which re-ships survivors
    # from files committed before a consumer's cursor). One extra write
    # of the updates batch — O(changelog), not O(table).
    change = _stage_files(updates, root)

    next_v = head + 1
    out = {
        "version": next_v,
        "mode": "merge",
        "operation": "merge",
        "merge_key": key,
        "added": [e["path"] for e in added],
        "removed": sorted(touched),
        "change_files": [e["path"] for e in change],
        "change_delete_col": delete_col,
        "files": untouched_entries + added,
        "schema": schema,
        "committed_at": time.time(),
        "txns": _carry_txns(manifest, meta),
    }
    if manifest.get("schema_evolved") and touched != {e["path"] for e in entries}:
        # untouched files keep their old physical schema
        out["schema_evolved"] = True
    if meta is not None:
        out["meta"] = meta
    if not _try_commit(root, next_v, out):
        raise TxConflict(
            f"merge lost the commit race at v{next_v} ({root}) — the rewrite "
            f"plan is stale; re-run the merge against the new head"
        )
    return next_v


def tx_restore(root: str, version: int) -> int:
    """RESTORE the table to an earlier version's content as a NEW commit
    (Delta's RESTORE TABLE ... VERSION AS OF): the new manifest re-
    references version N's exact file list — no data is copied, no files
    move, and the bad versions in between stay time-travel readable
    until vacuum. Recorded as mode="overwrite" (operation="restore"), so
    every downstream consumer already does the right thing: tx_changes
    resets its cumulative feed at the restore (the table's content was
    replaced) and the incremental cursors refuse to continue over it —
    both exactly what a content rollback demands.

    Pure driver-side manifest arithmetic; the only data-dependent cost
    is zero. Fails loudly if version N's manifest was vacuumed.
    Concurrency: plain optimistic commit at head+1 — a racing writer
    makes the restore lose and raise, because restoring over unseen
    commits silently would be an overwrite with a stale basis."""
    head = tx_head(root)
    if head is None:
        raise FileNotFoundError(f"no committed versions at {root}")
    if version > head:
        raise ValueError(f"cannot restore to v{version}: head is v{head}")
    src = _read_manifest(root, version)  # raises FileNotFoundError if vacuumed
    next_v = head + 1
    out = {
        "version": next_v,
        "mode": "overwrite",
        "operation": f"restore:v{version}",
        "added": [],
        "files": src["files"],
        "schema": src.get("schema"),
        "committed_at": time.time(),
        # idempotence state never rolls back: carry the HEAD's marks, not
        # the restored version's — a replayed batch after a restore must
        # still be recognized as already-committed
        "txns": _carry_txns(_read_manifest(root, head), None),
    }
    if src.get("schema_evolved"):
        out["schema_evolved"] = True
    if not _try_commit(root, next_v, out):
        raise TxConflict(
            f"restore lost the commit race at v{next_v} ({root}) — a writer "
            f"committed concurrently; re-check the head and re-run"
        )
    return next_v
