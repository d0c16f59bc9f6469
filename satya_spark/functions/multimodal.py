"""Multimodal column plumbing: image/audio/video as opaque binary.

The decode libraries (PIL/torchaudio/ffmpeg) are NOT in this
container, so the codec step is stubbed — but everything Spark-side
is real and tested: the typed schema, the Arrow batch path through
``mapInPandas``, partition sizing, and the UDF signatures a real
decoder would drop into.

Design for 100 TB of media:
* media rows are heavy → keep them in their own table keyed like the
  transcript/document tables; never carry blobs through shuffles —
  extract features first (mapInPandas, Arrow-batched), shuffle the
  small feature rows only.
* ``spark.sql.files.maxPartitionBytes`` governs blob-scan partition
  size; features stream out batch-by-batch (iterator API below), so
  executor memory stays bounded regardless of blob sizes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque blob
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def pil_available() -> bool:
    """importlib-guarded PIL probe (no import side effects)."""
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def decode_image(payload: bytes) -> "object":
    """Real decoder slot: decodes via PIL when it is installed
    (importlib-guarded — tests covering this branch skip when PIL is
    absent); in this sandbox (no PIL/libvips) it raises rather than
    silently degrading. ``extract_features``/``resize_images`` use the
    deterministic byte-grid stand-ins either way, so the Spark-side
    plumbing is identical with or without the real codec."""
    if pil_available():
        import io

        from PIL import Image

        return Image.open(io.BytesIO(payload))
    raise NotImplementedError(
        "image decode requires PIL/libvips — not present in this sandbox; "
        "extract_features uses the deterministic fake featurizer instead"
    )


def decode_resize_pil(payload: bytes, out_w: int, out_h: int) -> bytes:
    """PIL-backed decode+resize: grayscale nearest-neighbor to
    (out_w × out_h) bytes — the same output contract as the byte-grid
    stand-in in :func:`resize_images`, so a real codec drops in
    without changing the Spark pipeline or downstream schema."""
    img = decode_image(payload).convert("L")
    return img.resize((out_w, out_h), resample=0).tobytes()  # 0 = NEAREST


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in featurizer: byte-histogram moments.
    Replace with a real model forward pass; the Spark plumbing
    (batching, schema, partitioning) is identical.

    Quantized to 6 decimals with explicit half-up rounding
    (floor(x*1e6 + 0.5)/1e6) rather than Python's banker's round so
    the DuckDB oracle (floor-based, same double ops) is bit-equal."""
    import math

    if payload is None:
        return None
    n = len(payload)
    if n == 0:
        return [0.0] * dim
    return [
        math.floor(
            (sum(payload[i::dim]) / max(1, len(payload[i::dim])) / 255.0) * 1_000_000
            + 0.5
        )
        / 1_000_000
        for i in range(dim)
    ]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction via mapInPandas — the blob
    never leaves the executor; only (id, kind, n_bytes, feature)
    rows continue down the pipeline."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_feature(p, dim) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("thumb", T.BinaryType(), True),
    ]
)


def resize_images(media: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """Image-resize plumbing (Arrow-batched mapInPandas). The real
    resampler (PIL/libvips) is not in this container; the stand-in
    treats the payload as a (width×height) byte grid and
    nearest-neighbor-samples it to (out_w × out_h) bytes — a
    deterministic pure-bytes transform with the exact signature,
    batch shape, and schema a real decoder+resize drops into. Only
    image rows flow; the thumb (out_w·out_h bytes) is what continues
    down the pipeline, never the original blob."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "out_w": [], "out_h": [], "thumb": []}
            for mid, w, h, payload in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                rows["media_id"].append(mid)
                rows["out_w"].append(out_w)
                rows["out_h"].append(out_h)
                if payload is None or not w or not h:
                    rows["thumb"].append(None)
                    continue
                w, h = int(w), int(h)
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                grid = np.resize(buf, (h, w))  # fake decode: byte grid
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                rows["thumb"].append(grid[np.ix_(ys, xs)].tobytes())
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "image").select(
        "media_id", "width", "height", "payload"
    ).mapInPandas(run, schema=RESIZE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, ts_ms) to
    decode — the explode happens on metadata only (cheap, codegen),
    so the expensive decode fan-out is explicit and partitionable."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("ts_ms"),
        )
    )


def synthesize_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.when(F.col("id") % 3 == 0, (F.col("id") % 640 + 16).cast("int")).alias("width"),
        F.when(F.col("id") % 3 == 0, (F.col("id") % 480 + 16).cast("int")).alias("height"),
        F.when(F.col("id") % 3 != 0, (F.col("id") % 5000 + 100).cast("int")).alias(
            "duration_ms"
        ),
        F.encode(
            F.repeat(F.concat(F.lit("blob"), F.col("id").cast("string")), 16), "UTF-8"
        ).alias("payload"),
    )
    return df
