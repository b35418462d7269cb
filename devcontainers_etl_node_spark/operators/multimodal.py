"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The default decode step is STUBBED (no image/audio libraries in this
container): `decode_image_features` produces a deterministic fake feature
vector from the payload bytes. `decode_image_real` is the genuine PIL
path — grayscale grid features + decoded dimensions — available when
Pillow is installed (its test is importorskip-gated; without Pillow it
raises a clear ModuleNotFoundError instead of silently stubbing).
Everything Spark-side — schema, batch shape, partitioning, UDF
signatures — is real and tested in both cases.

Scale: mapInPandas streams Arrow batches; payload bytes never hit the
driver. Partition sizing for 100 TB of media = spark.sql.files.
maxPartitionBytes on the source + repartition by a content-hash bucket so
one huge video can't skew a task.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Turn a text table into a media table: payload = utf-8 bytes of the
    text (stands in for image bytes), typed metadata struct alongside."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image_features(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    STUB decode: deterministic fake features from byte statistics (so tests
    are reproducible). Swap `_fake_features` for a real decoder (PIL/
    torchvision/ffmpeg) at the marked point — the Spark plumbing does not
    change.
    """

    def _fake_features(payload: bytes | None) -> list[float]:
        if payload is None:
            return [0.0] * feature_dim
        arr = np.frombuffer(payload, dtype=np.uint8)
        if arr.size == 0:
            return [0.0] * feature_dim
        # REAL-DECODER INTEGRATION POINT: replace from here ...
        chunks = np.array_split(arr.astype(np.float64), feature_dim)
        return [float(c.mean()) if c.size else 0.0 for c in chunks]
        # ... to here with e.g. PIL.Image.open(io.BytesIO(payload)).

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)).astype("int64"),
                    "feature": pdf["payload"].map(_fake_features),
                }
            )
            yield out

    return df.mapInPandas(batches, schema=FEATURES_SCHEMA)


REAL_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image_real(df: DataFrame, grid: int = 8) -> DataFrame:
    """Real image decode over the same Arrow-batched mapInPandas plumbing
    as the stub: payload → decoded pixels → grayscale → grid×grid pooled
    pixel feature in [0,1], plus the decoded dimensions.

    Decoder selection (per executor, import-gated): PIL when Pillow is
    installed (every format, C-speed resampling — the production path);
    otherwise the stdlib PNG codec (operators/png.py — 8-bit
    gray/RGB/alpha PNGs, Python-speed, area pooling instead of PIL's
    resampling kernel) so the operator still REALLY decodes in
    dependency-free environments like this sandbox, rather than raising.
    Undecodable payloads (corrupt images, and under the fallback any
    non-PNG format — a fact of life in any 100 TB crawl) yield NULL
    feature/dims instead of failing the job; count them downstream with
    `feature IS NULL`.
    """
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ModuleNotFoundError:
        have_pil = False

    def _decode(payload: bytes | None):
        if payload is None:
            return (None, None, None)
        try:
            if have_pil:
                import io

                from PIL import Image

                with Image.open(io.BytesIO(payload)) as img:
                    w, h = img.size
                    small = img.convert("L").resize((grid, grid))
                    px = np.asarray(small, dtype=np.float64) / 255.0
            else:
                from devcontainers_etl_node_spark.operators import png

                pixels = png.decode(bytes(payload))
                h, w = pixels.shape[:2]
                px = png.pool_gray(png.to_gray(pixels), grid)
            return (int(w), int(h), [float(v) for v in px.ravel()])
        except Exception:
            return (None, None, None)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf["payload"].map(_decode)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)).astype("int64"),
                    "width": decoded.map(lambda d: d[0]),
                    "height": decoded.map(lambda d: d[1]),
                    "feature": decoded.map(lambda d: d[2]),
                }
            )

    return df.mapInPandas(batches, schema=REAL_FEATURES_SCHEMA)


def resize_stub(df: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Image resize stub over the same Arrow-batched plumbing as the real
    thing: payload is deterministically downsampled byte-wise to the
    target-area budget (stands in for bilinear resample — swap the marked
    line for PIL's Image.resize), meta is rewritten with the target dims.
    Batch shape, binary-in/binary-out signature, and partitioning are what
    a real resizer needs."""
    n_target = target_w * target_h

    def _resize(payload: bytes | None) -> bytes | None:
        if payload is None:
            return None
        arr = np.frombuffer(payload, dtype=np.uint8)
        if arr.size <= n_target:
            return payload
        # REAL-RESIZER INTEGRATION POINT: replace this stride-sample with
        # PIL.Image.open(...).resize((target_w, target_h)).tobytes()
        idx = np.linspace(0, arr.size - 1, n_target).astype(np.int64)
        return arr[idx].tobytes()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = pdf["payload"].map(_resize)
            meta = pd.DataFrame(
                {
                    "mime": pdf["meta"].map(lambda m: None if m is None else m["mime"]),
                    "width": target_w,
                    "height": target_h,
                    "n_bytes": resized.map(lambda p: 0 if p is None else len(p)).astype("int64"),
                }
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": resized,
                    "meta": meta.to_dict("records"),
                }
            )

    return df.mapInPandas(batches, schema=MEDIA_SCHEMA)


def frame_sample_stub(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling stub: models 1-in-N frame selection as metadata
    (real frame extraction needs ffmpeg). Keeps the operator signature and
    partitioning real."""
    return df.withColumn(
        "sampled_frames",
        F.when(
            F.col("meta.n_bytes").isNotNull(),
            F.floor(F.col("meta.n_bytes") / F.lit(every_n)).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def decode_image_features_arrow(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """mapInArrow twin of decode_image_features: the batch arrives as a
    pyarrow RecordBatch and leaves as one — no pandas materialization in
    the middle, which matters when payloads are large (pandas object
    columns copy every cell; Arrow buffers are zero-copy slices). Same
    deterministic stub features, byte-identical output to the pandas
    path (pinned by test)."""
    import pyarrow as pa

    def _features(payload: bytes | None) -> list[float]:
        if payload is None:
            return [0.0] * feature_dim
        arr = np.frombuffer(payload, dtype=np.uint8)
        if arr.size == 0:
            return [0.0] * feature_dim
        chunks = np.array_split(arr.astype(np.float64), feature_dim)
        return [float(c.mean()) if c.size else 0.0 for c in chunks]

    def batches(it):
        for batch in it:
            payloads = batch.column("payload").to_pylist()
            ids = batch.column("media_id")
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(
                        [0 if p is None else len(p) for p in payloads], type=pa.int64()
                    ),
                    pa.array([_features(p) for p in payloads], type=pa.list_(pa.float32())),
                ],
                names=["media_id", "n_bytes", "feature"],
            )

    return df.mapInArrow(batches, schema=FEATURES_SCHEMA)
