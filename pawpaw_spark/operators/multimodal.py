"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step itself is STUBBED (image/audio libraries are not in
this container): ``decode_image`` raises ``NotImplementedError`` unless
a decoder is importable, and ``fake_features`` is the deterministic
stand-in used by tests. Everything Spark-side — schema, Arrow batch
shape, partitioning, UDF signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 16


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize an opaque-binary media table from the documents table
    (deterministic; payload = utf8 bytes of text — a stand-in blob)."""
    return docs.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(F.col("doc_id"), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.col("doc_id"), F.lit(1080)) + 1).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )


def decode_image(payload: bytes):
    """Real decode path — requires an image library not present here."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "image decoding requires Pillow; this container stubs the decode step"
        ) from e


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake embedding: blake2b-seeded uniform vector."""
    h = hashlib.blake2b(payload or b"", digest_size=8).digest()
    rng = np.random.RandomState(int.from_bytes(h, "little") % (2**32))
    return rng.rand(dim).astype(np.float64)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """(media_id, kind, feature: array<double>) via mapInPandas — the
    real pipeline swaps `_fake_feature` for a model forward pass; the
    batch shape and schema stay identical."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_feature(p, dim).tolist() if p is not None else None
                for p in pdf["payload"].values
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, schema="media_id string, kind string, feature array<double>"
    )


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 32) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits (media_id,
    frame_idx, ts_ms) — pure column ops (sequence + explode); the
    actual frame decode would hang off ts_ms in the real pipeline."""
    n = F.least(
        (F.col("duration_ms") / F.lit(every_ms)).cast("int") + 1, F.lit(max_frames)
    )
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.posexplode(F.sequence(F.lit(0), n - 1)).alias("frame_idx", "__i"),
        )
        .select("media_id", "frame_idx", (F.col("__i") * every_ms).cast("long").alias("ts_ms"))
    )
