"""GB-scale multimodal rung (r10 verdict task 8): the binary ingest →
shard-export → decode path measured at ~1 GB of REAL stdlib-PNG blobs —
the multimodal family's first non-toy measurement.

Phases (each timed, throughput in MB/s of payload bytes):

1. GENERATE: N deterministic noise PNGs (seeded per doc id, encoded by
   ``operators/png.py`` in executors via foreachPartition — noise is
   zlib-incompressible, so bytes-on-disk ≈ raw pixel volume) written as
   individual ``.png`` files, the raw-media landing shape.  One planted
   oversize blob exercises the ``max_bytes`` guard.
2. INGEST: ``read_binary_tree`` (binaryFile source, pathGlobFilter,
   max_bytes guard) → count + byte totals; the guard must NULL exactly
   the planted oversize payload while keeping its metadata row.
3. EXPORT: ``write_webdataset(binary_cols={"png": ...})`` → tar shards,
   written TWICE; a sample of shards is sha256-compared across the two
   writes (byte-reproducible shards at the GB rung).
4. DECODE: ``read_webdataset`` → sample K members → ``png.decode`` in
   executors, pixel arrays compared against re-generated sources
   (sha-pinned roundtrip: generator pixels == decoded pixels).

Usage:
    python tools/bench_media_rung.py [n_images] [side]
    # defaults: 5500 images of 256x256 RGB  (~1.08 GB of payload)

Paste the table into PERF.md when it changes.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/media_rung"


def run_rung(n_images: int = 5500, side: int = 256) -> dict:
    """Run the full rung; returns the phase metrics so the pytest slow
    gate (tests/test_media_rung.py, r11 verdict task 8) can pin the
    throughput floor and the byte-identical export without re-parsing
    stdout. Raises AssertionError on any correctness failure (guard
    count, shard sha mismatch, pixel mismatch)."""
    from pyspark.sql import functions as F

    from devcontainers_etl_node_spark.session import get_spark
    from devcontainers_etl_node_spark.sinks.webdataset import write_webdataset
    from devcontainers_etl_node_spark.sources.files import read_binary_tree
    from devcontainers_etl_node_spark.sources.webdataset import read_webdataset

    spark = get_spark()
    png_dir = os.path.join(ROOT, "png")
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(png_dir)
    print(
        f"# media rung: {n_images} images {side}x{side}x3 "
        f"(~{n_images * side * side * 3 / 1e9:.2f} GB raw), "
        f"start loadavg={os.getloadavg()[0]:.2f}"
    )

    # --- phase 1: generate -------------------------------------------------
    def _gen_partition(rows) -> None:
        import numpy as np

        from devcontainers_etl_node_spark.operators import png as pnglib

        for row in rows:
            i = row.id
            rng = np.random.default_rng(i)
            px = rng.integers(0, 256, (side, side, 3), dtype=np.uint8)
            blob = pnglib.encode(px)
            with open(os.path.join(png_dir, f"img{i:07d}.png"), "wb") as f:
                f.write(blob)

    t0 = time.perf_counter()
    spark.range(n_images).repartition(64).foreachPartition(_gen_partition)
    # planted oversize blob for the max_bytes guard
    with open(os.path.join(png_dir, "img_oversize.png"), "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n" + b"\x00" * (8 << 20))
    t_gen = time.perf_counter() - t0
    payload_bytes = sum(
        os.path.getsize(os.path.join(png_dir, p)) for p in os.listdir(png_dir)
    )
    print(
        f"| generate | {n_images}+1 files, {payload_bytes / 1e9:.2f} GB "
        f"| {t_gen:.1f} s | {payload_bytes / 1e6 / t_gen:.0f} MB/s |"
    )

    # --- phase 2: ingest ---------------------------------------------------
    t0 = time.perf_counter()
    media = read_binary_tree(spark, png_dir, glob="*.png", max_bytes=4 << 20)
    agg = media.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_bytes").alias("listed_bytes"),
        F.sum(F.length("content")).alias("read_bytes"),
        F.sum(F.when(F.col("content").isNull(), 1).otherwise(0)).alias("nulled"),
    ).collect()[0]
    t_ingest = time.perf_counter() - t0
    assert agg["rows"] == n_images + 1 and agg["nulled"] == 1, agg
    print(
        f"| ingest (binaryFile + guard) | {agg['rows']} rows, "
        f"{agg['read_bytes'] / 1e9:.2f} GB read, {agg['nulled']} guarded "
        f"| {t_ingest:.1f} s | {agg['read_bytes'] / 1e6 / t_ingest:.0f} MB/s |"
    )

    # --- phase 3: shard export (twice, sha-compared) -----------------------
    sharded = media.filter(F.col("content").isNotNull()).select(
        F.regexp_extract("object", r"img(\d+)\.png", 1).cast("long").alias("doc_id"),
        F.col("content"),
        (F.regexp_extract("object", r"img(\d+)\.png", 1).cast("long") % 64).alias(
            "shard"
        ),
    )
    walls = []
    for sub in ("a", "b"):
        t0 = time.perf_counter()
        write_webdataset(
            sharded,
            os.path.join(ROOT, f"shards_{sub}"),
            "shard",
            "doc_id",
            None,
            binary_cols={"png": "content"},
        )
        walls.append(time.perf_counter() - t0)
    sample = sorted(os.listdir(os.path.join(ROOT, "shards_a")))[:8]
    for t in sample:
        ha = hashlib.sha256(
            open(os.path.join(ROOT, "shards_a", t), "rb").read()
        ).hexdigest()
        hb = hashlib.sha256(
            open(os.path.join(ROOT, "shards_b", t), "rb").read()
        ).hexdigest()
        assert ha == hb, t
    n_shards = len(os.listdir(os.path.join(ROOT, "shards_a")))
    print(
        f"| export (webdataset, {n_shards} shards) | byte-identical across "
        f"2 writes (sha256, {len(sample)} sampled) | {min(walls):.1f} s "
        f"| {payload_bytes / 1e6 / min(walls):.0f} MB/s |"
    )

    # --- phase 4: decode a sample, pixels == generator ---------------------
    back = read_webdataset(spark, os.path.join(ROOT, "shards_a"))
    t0 = time.perf_counter()

    def _check(batches):
        import numpy as np
        import pandas as pd

        from devcontainers_etl_node_spark.operators import png as pnglib

        for pdf in batches:
            ok = []
            for key, payload in zip(pdf["key"], pdf["payload"]):
                i = int(key)
                px = pnglib.decode(bytes(payload))
                rng = np.random.default_rng(i)
                want = rng.integers(0, 256, (side, side, 3), dtype=np.uint8)
                ok.append(bool(np.array_equal(px, want)))
            yield pd.DataFrame({"ok": ok})

    sample_members = back.filter(F.col("key").cast("long") % 100 == 0)
    checked = sample_members.mapInPandas(_check, "ok boolean").collect()
    t_decode = time.perf_counter() - t0
    assert checked and all(r.ok for r in checked), "pixel mismatch"
    print(
        f"| decode sample ({len(checked)} imgs, stdlib PNG) | pixels == "
        f"generator (exact) | {t_decode:.1f} s "
        f"| {len(checked) * side * side * 3 / 1e6 / t_decode:.0f} MB/s raw |"
    )
    print(f"end loadavg={os.getloadavg()[0]:.2f}")
    shutil.rmtree(ROOT, ignore_errors=True)
    return {
        "payload_gb": payload_bytes / 1e9,
        "gen_mbps": payload_bytes / 1e6 / t_gen,
        "ingest_mbps": agg["read_bytes"] / 1e6 / t_ingest,
        "guarded_rows": int(agg["nulled"]),
        "export_mbps": payload_bytes / 1e6 / min(walls),
        "export_identical_shards": len(sample),
        "decoded_ok": len(checked),
    }


def main() -> int:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 5500
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    run_rung(n_images, side)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
