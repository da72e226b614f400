"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star extension (BASELINE.json: "multimodal columns").  The schema,
partitioning, UDF signatures, and batch shapes are REAL and tested; the
actual codec calls are stubbed (this container ships no image/audio
libraries) behind ``decoder=`` hooks — a deployment passes
``decoder=PIL_decode`` and nothing else changes.  The default
``deterministic_fake_decode`` derives pixel/sample statistics from the
bytes themselves (seeded by content hash), so tests and oracles are
stable without any codec.

Plumbing rules (the 100 TB shape):
  * media rows are processed with ``mapInPandas`` — Arrow batches of
    (pk, binary, meta), so a 10 MB image never becomes a JVM object
    row-by-row, and batch size bounds executor memory;
  * metadata (format, width, height, duration…) lives in a typed struct
    COLUMN next to the blob — predicate pushdown prunes on metadata
    without touching bytes (Parquet column pruning does the rest);
  * feature vectors come back as ``array<float>`` ready for the kNN /
    dedup machinery in this package.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def media_schema(pk_type: T.DataType = T.LongType()) -> T.StructType:
    """Canonical media table schema: (pk, content binary, meta struct)."""
    return T.StructType(
        [
            T.StructField("media_id", pk_type, False),
            T.StructField("content", T.BinaryType()),
            T.StructField("meta", MEDIA_META),
        ]
    )


def deterministic_fake_decode(content: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder: a (height × width) uint8 'image' seeded by the blob's
    content hash — deterministic, codec-free.  Replace with a real decoder
    (PIL/ffmpeg) in deployment; the Spark plumbing is identical."""
    seed = int.from_bytes(hashlib.sha256(content).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(height, width), dtype=np.uint8)


def decode_unavailable(content: bytes, width: int, height: int) -> np.ndarray:
    """The honest stub for a missing codec dependency."""
    raise NotImplementedError(
        "no image/audio codec in this environment — pass decoder="
        "deterministic_fake_decode (tests) or a real PIL/ffmpeg-backed decoder"
    )


def extract_features(
    df: DataFrame,
    out_dim: int = 16,
    decoder: Callable[[bytes, int, int], np.ndarray] = deterministic_fake_decode,
    content_col: str = "content",
    pk: str = "media_id",
) -> DataFrame:
    """binary → ``array<float>`` feature vector via mapInPandas.

    The fake featurizer is a per-band mean histogram of the decoded pixel
    grid — any real embedding model slots into the same batch loop (and
    would batch ONE model call per Arrow batch, not per row).
    """

    def featurize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = []
            for content, meta in zip(pdf[content_col], pdf["meta"]):
                w = int(meta["width"] or 8)
                h = int(meta["height"] or 8)
                img = decoder(bytes(content), w, h)
                bands = np.array_split(img.astype(np.float64).ravel(), out_dim)
                feats.append(np.array([b.mean() / 255.0 for b in bands], dtype=np.float32))
            yield pd.DataFrame({pk: pdf[pk], "feature": list(feats)})

    return df.mapInPandas(
        featurize, schema=f"{pk} long, feature array<float>"
    )


def resize(
    df: DataFrame,
    new_width: int,
    new_height: int,
    decoder: Callable[[bytes, int, int], np.ndarray] = deterministic_fake_decode,
    content_col: str = "content",
    pk: str = "media_id",
) -> DataFrame:
    """binary → resized binary (nearest-neighbour on the decoded grid) +
    updated metadata.  Batch shape: bytes in, bytes out, meta rewritten."""

    def do_resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            blobs, metas = [], []
            for content, meta in zip(pdf[content_col], pdf["meta"]):
                w = int(meta["width"] or 8)
                h = int(meta["height"] or 8)
                img = decoder(bytes(content), w, h)
                yi = (np.arange(new_height) * h // new_height).clip(0, h - 1)
                xi = (np.arange(new_width) * w // new_width).clip(0, w - 1)
                out = img[np.ix_(yi, xi)]
                blobs.append(out.tobytes())
                metas.append(
                    {
                        "format": (meta["format"] or "raw") + "-resized",
                        "width": new_width,
                        "height": new_height,
                        "n_frames": meta["n_frames"],
                        "sample_rate": meta["sample_rate"],
                    }
                )
            yield pd.DataFrame({pk: pdf[pk], content_col: blobs, "meta": metas})

    out_schema = T.StructType(
        [
            T.StructField(pk, T.LongType()),
            T.StructField(content_col, T.BinaryType()),
            T.StructField("meta", MEDIA_META),
        ]
    )
    return df.mapInPandas(do_resize, schema=out_schema)


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    content_col: str = "content",
    pk: str = "media_id",
) -> DataFrame:
    """Video frame sampling: one output row per kept frame index.

    The frame INDEX math is real (explode n_frames / every_n rows per
    video, carrying (pk, frame_no, byte offsets)); actual frame decode is
    the decoder's job downstream.  Pure column expressions — the explode
    is the only row amplification, and it's bounded by n_frames/every_n.
    """
    frames = F.sequence(
        F.lit(0),
        F.greatest((F.coalesce(F.col("meta")["n_frames"], F.lit(1)) - 1), F.lit(0)),
        F.lit(every_n),
    )
    return df.select(
        F.col(pk),
        F.explode(frames).alias("frame_no"),
        F.col("meta"),
        F.col(content_col),
    )


def media_fingerprint(
    df: DataFrame, content_col: str = "content", pk: str = "media_id"
) -> DataFrame:
    """Exact-dup fingerprint for media blobs: (pk, byte length, sha256-hex
    prefix) — pure expressions (sha2 over binary), feeding
    exact_dedup-style groupBys without decoding anything."""
    return df.select(
        F.col(pk),
        F.length(F.col(content_col)).alias("n_bytes"),
        F.substring(F.sha2(F.col(content_col), 256), 1, 16).alias("fp_hex"),
    )
