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
3. files appear under a temp name and are renamed into place, so a
   killed job never leaves a half shard with a valid name (rename is
   atomic on a POSIX dir; on an object store point ``root`` at local
   scratch and upload, or accept PUT-once semantics).

Shard ids come from the caller — pair with ``token_shard_pack``'s
budget-packed assignment for equal-token shards, or any bounded id
column.  At 100 TB: ~100M tokens/shard → tars of a few hundred MB, one
per task; the write is shuffle(shard) + sort + stream, nothing else.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

from pyspark.sql import DataFrame, functions as F


def _tarinfo(name: str, size: int) -> tarfile.TarInfo:
    info = tarfile.TarInfo(name=name)
    info.size = size
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    return info


def write_webdataset(
    df: DataFrame,
    root: str,
    shard_col: str,
    key_col: str,
    text_col: str,
    meta_cols: list[str] | None = None,
    n_tasks: int | None = None,
) -> None:
    """Write ``{key}.txt`` (+ ``{key}.json`` when ``meta_cols``) samples
    into ``root/shard-{shard:06d}.tar``, one tar per distinct
    ``shard_col`` value.  Keys must be unique; member order inside a
    shard is ascending ``key_col``."""
    meta_cols = meta_cols or []
    os.makedirs(root, exist_ok=True)
    cols = [shard_col, key_col, text_col, *meta_cols]
    n = n_tasks or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    arranged = (
        df.select(*cols)
        .repartition(int(n), F.col(shard_col))
        .sortWithinPartitions(shard_col, key_col)
    )

    def _write_partition(rows) -> None:
        tar = None
        cur = None
        tmp = final = None

        def _close() -> None:
            if tar is not None:
                tar.close()
                os.replace(tmp, final)

        for row in rows:
            shard = row[shard_col]
            if shard != cur:
                _close()
                cur = shard
                final = os.path.join(root, f"shard-{int(shard):06d}.tar")
                tmp = final + ".inprogress"
                tar = tarfile.open(tmp, "w")
            key = str(row[key_col])
            payload = (row[text_col] or "").encode("utf-8")
            tar.addfile(_tarinfo(f"{key}.txt", len(payload)), io.BytesIO(payload))
            if meta_cols:
                meta = json.dumps(
                    {c: row[c] for c in meta_cols}, sort_keys=True, default=str
                ).encode("utf-8")
                tar.addfile(_tarinfo(f"{key}.json", len(meta)), io.BytesIO(meta))
        _close()

    arranged.foreachPartition(_write_partition)
