"""WebDataset-style tar-shard export — the trainer-facing output format.

Large-scale training loaders (WebDataset, Megatron-Energon, torchdata)
read SEQUENTIAL tar shards, not parquet: each sample is a run of
consecutive tar members sharing a basename (``{key}.txt``,
``{key}.json``), and a dataloader worker streams whole shards.  This
sink turns a curated DataFrame into that layout with no driver
participation:

1. rows are hash-partitioned by their shard id (every shard lands wholly
   in one task; a task may own several shards) and sorted within the
   partition by (shard, order) so each tar's member order is
   deterministic;
2. each task streams its shards straight to ``shard-{id:06d}.tar`` via
   ``tarfile`` — fixed mtime/uid/gid so the tar BYTES are reproducible
   run-to-run (same content → same sha256, pinned in tests);
3. publication is crash- and speculation-safe: the tar is built under a
   TASK-ATTEMPT-UNIQUE temp name (two speculative attempts of the same
   partition never touch the same in-progress file) and only a complete
   tar reaches the final name.

Two publication paths, chosen by the shape of ``root``:

- **plain POSIX path** (no URI scheme): the temp tar is written next to
  the final name and ``os.replace``d into place — atomic on a POSIX
  dir.  A killed attempt leaves only ``*.inprogress.<attempt>`` litter,
  never a half shard under a valid name; the winning attempt's rename
  is last-writer-wins over byte-identical content.
- **URI root** (``file:///…``, ``s3://…``, ``hdfs://…``): the 100 TB
  path.  Each tar is staged to task-local scratch, then uploaded via
  ``pyarrow.fs`` resolved from the URI.  On a local/NFS filesystem the
  upload goes to an attempt-unique remote temp then ``move``s (atomic
  rename); on an object store it streams straight to the final key —
  the object becomes visible only when the multipart upload completes
  on close, so a crashed attempt publishes nothing (PUT-once
  atomicity).  Staged-vs-direct parity (sha256-equal shards) is pinned
  in tests.

Shard ids come from the caller — pair with ``token_shard_pack``'s
budget-packed assignment for equal-token shards, or any bounded id
column.  At 100 TB: ~100M tokens/shard → tars of a few hundred MB, one
per task; the write is shuffle(shard) + sort + stream + upload, nothing
else, and scratch usage per task is one shard at a time.
"""

from __future__ import annotations

import io
import json
import os
import shutil
import tarfile
import tempfile

from pyspark import TaskContext
from pyspark.sql import DataFrame, functions as F


def _tarinfo(name: str, size: int) -> tarfile.TarInfo:
    info = tarfile.TarInfo(name=name)
    info.size = size
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    return info


def _attempt_id() -> int:
    ctx = TaskContext.get()
    return ctx.taskAttemptId() if ctx is not None else os.getpid()


def write_webdataset(
    df: DataFrame,
    root: str,
    shard_col: str,
    key_col: str,
    text_col: str | None,
    meta_cols: list[str] | None = None,
    n_tasks: int | None = None,
    binary_cols: dict[str, str] | None = None,
) -> None:
    """Write ``{key}.txt`` (+ ``{key}.json`` when ``meta_cols``, +
    ``{key}.{ext}`` binary members when ``binary_cols``) samples into
    ``root/shard-{shard:06d}.tar``, one tar per distinct ``shard_col``
    value.  Keys must be unique; member order inside a shard is
    ascending ``key_col``, and within a sample: ``.txt``, binary
    extensions in sorted order, ``.json`` — deterministic, so tar bytes
    stay reproducible.  ``binary_cols`` maps tar member extension ->
    binary column (``{"png": "content"}`` writes ``{key}.png`` from
    ``content``); a NULL payload skips that member (the multimodal
    ``max_bytes`` guard NULLs oversized blobs — the sample's other
    members still ship).  ``text_col=None`` writes no ``.txt`` member
    (pure-media shards).  ``root`` may be a plain POSIX path (direct
    write + atomic rename) or a ``pyarrow.fs``-resolvable URI
    (``file://``, ``s3://``, ``hdfs://`` — stage to local scratch, then
    upload; see module docstring for the atomicity contract)."""
    meta_cols = meta_cols or []
    binary_cols = binary_cols or {}
    staged = "://" in root
    if staged:
        from pyarrow import fs as pa_fs

        filesystem, base = pa_fs.FileSystem.from_uri(root)
        filesystem.create_dir(base, recursive=True)
    else:
        os.makedirs(root, exist_ok=True)
    cols = [shard_col, key_col]
    if text_col is not None:
        cols.append(text_col)
    cols += [*meta_cols, *binary_cols.values()]
    n = n_tasks or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    arranged = (
        df.select(*cols)
        .repartition(int(n), F.col(shard_col))
        .sortWithinPartitions(shard_col, key_col)
    )

    def _write_partition(rows) -> None:
        attempt = _attempt_id()
        if staged:
            from pyarrow import fs as pa_fs

            filesystem, base = pa_fs.FileSystem.from_uri(root)

        tar = None
        cur = None
        tmp = final_name = None

        def _publish() -> None:
            nonlocal tar
            if tar is None:
                return
            tar.close()
            tar = None
            if not staged:
                os.replace(tmp, os.path.join(root, final_name))
                return
            dest = f"{base}/{final_name}"
            try:
                if filesystem.type_name == "local":
                    # local/NFS: attempt-unique remote temp, then atomic
                    # rename — same discipline as the POSIX path
                    remote_tmp = f"{dest}.inprogress.{attempt}"
                    with open(tmp, "rb") as src, filesystem.open_output_stream(
                        remote_tmp
                    ) as dst:
                        shutil.copyfileobj(src, dst)
                    filesystem.move(remote_tmp, dest)
                else:
                    # object store: stream to the final key — the object
                    # is visible only when the upload completes on close
                    # (PUT-once), so a crashed attempt publishes nothing
                    with open(tmp, "rb") as src, filesystem.open_output_stream(
                        dest
                    ) as dst:
                        shutil.copyfileobj(src, dst)
            finally:
                os.unlink(tmp)

        for row in rows:
            shard = row[shard_col]
            if shard != cur:
                _publish()
                cur = shard
                final_name = f"shard-{int(shard):06d}.tar"
                if staged:
                    fd, tmp = tempfile.mkstemp(prefix="wds-", suffix=".tar")
                    os.close(fd)
                else:
                    tmp = os.path.join(
                        root, f"{final_name}.inprogress.{attempt}"
                    )
                tar = tarfile.open(tmp, "w")
            key = str(row[key_col])
            if text_col is not None:
                payload = (row[text_col] or "").encode("utf-8")
                tar.addfile(_tarinfo(f"{key}.txt", len(payload)), io.BytesIO(payload))
            for ext in sorted(binary_cols):
                blob = row[binary_cols[ext]]
                if blob is None:  # max_bytes-guarded payload: skip member
                    continue
                blob = bytes(blob)
                tar.addfile(_tarinfo(f"{key}.{ext}", len(blob)), io.BytesIO(blob))
            if meta_cols:
                meta = json.dumps(
                    {c: row[c] for c in meta_cols}, sort_keys=True, default=str
                ).encode("utf-8")
                tar.addfile(_tarinfo(f"{key}.json", len(meta)), io.BytesIO(meta))
        _publish()

    arranged.foreachPartition(_write_partition)
