"""WebDataset tar-shard ingest — the read half of
``sinks/webdataset.write_webdataset``.

Trainers consume tar shards natively; the ENGINE needs to read them back
for audits (did the export conserve the corpus?), re-curation of an
exported dataset, and mixed pipelines where an upstream team ships tars
instead of parquet.  One tar = one ``binaryFile`` row = one task's worth
of samples — exactly the granularity a WebDataset dataloader worker uses,
so parallelism scales with shard count by construction, and a shard's
samples are reassembled in member order inside a single Arrow batch
(members sharing a basename are one sample; no cross-task state).

Memory: ``binaryFile`` materializes a whole tar per row, so shard size is
the working-set bound — the sink's ~budget-sized shards (a few hundred MB
at production settings) fit comfortably; this is a property of the
FORMAT (tars are not splittable without an index), not of this reader.
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SCHEMA = "shard string, key string, ext string, payload binary"


def read_webdataset(spark: SparkSession, root: str) -> DataFrame:
    """One row per tar MEMBER: (shard file name, sample key, extension,
    raw payload bytes).  Callers pivot extensions back into columns
    (``groupBy(key).pivot(ext)`` or a map_from_entries collect) — kept
    long-form here so arbitrary member sets round-trip unchanged."""
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "shard-*.tar")
        .load(root)
        .select("path", "content")
    )

    def _untar(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                shards, keys, exts, payloads = [], [], [], []
                name = os.path.basename(path)
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tar:
                    for member in tar.getmembers():
                        if not member.isfile():
                            continue
                        base, _, ext = member.name.rpartition(".")
                        shards.append(name)
                        keys.append(base if base else member.name)
                        exts.append(ext if base else "")
                        payloads.append(tar.extractfile(member).read())
                yield pd.DataFrame(
                    {"shard": shards, "key": keys, "ext": exts, "payload": payloads}
                )

    return blobs.mapInPandas(_untar, SCHEMA)
