"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video payloads are ``binary`` columns travelling next
to typed metadata (mime, width/height, duration, sample rate). Decode /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so the
bytes never round-trip through Python row-at-a-time, and partition sizing
is controlled by ``spark.sql.files.maxPartitionBytes`` on the read side.

The actual codec calls are STUBBED (this container has no image/audio
libraries): ``_decode_image_bytes`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake (derived from the
payload hash) stands in so the Spark-side plumbing — schema, batching,
UDF signatures — is fully real and testable. Swap the stub for
PIL/torchaudio/ffmpeg calls in a real deployment; nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "path string, payload binary, mime string, width int, height int"
)
IMAGE_FEATURES_SCHEMA = (
    "path string, mime string, width int, height int, feature array<float>"
)


def read_binary_dir(spark, path: str, glob: str | None = None) -> DataFrame:
    """Scan a directory of media files as (path, modificationTime, length,
    content) via Spark's binaryFile source — the CopySource-style
    file-manifest scan (reference: gobblin-data-management
    .../copy/CopySource.java:108) with the bytes inline."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def _decode_image_bytes(payload: bytes, fake: bool) -> tuple[int, int]:
    """Return (width, height). STUB: real impl would use PIL/libvips."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this "
            "container; pass fake=True for deterministic plumbing tests"
        )
    h = hash(payload) & 0xFFFFFFFF
    return (64 + h % 512, 64 + (h >> 16) % 512)


def extract_image_meta(df: DataFrame, payload_col: str = "content",
                       fake: bool = True) -> DataFrame:
    """binary payload -> (path, payload, mime, width, height) via
    mapInPandas (one Arrow batch per call, not one row)."""

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_decode_image_bytes(b, fake) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "payload": pdf[payload_col],
                    "mime": ["image/unknown"] * len(pdf),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return df.mapInPandas(_op, schema=IMAGE_META_SCHEMA)


def image_features(df: DataFrame, payload_col: str = "payload",
                   dim: int = 8, fake: bool = True) -> DataFrame:
    """Feature-extraction stage: payload -> fixed-dim float vector.

    STUB feature: deterministic bytes-hash-seeded vector (real impl: a
    vision encoder via an inference service or ONNX batch call). The
    contract that matters at scale is here: fixed output dim, Arrow
    batches, no driver involvement.
    """

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake:
                raise NotImplementedError("feature extraction stubbed in v1")
            feats = []
            for b in pdf[payload_col]:
                rng = np.random.default_rng(abs(hash(b)) % (2**32))
                feats.append(rng.standard_normal(dim).astype("float32"))
            out = pdf[["path", "mime", "width", "height"]].copy()
            out["feature"] = feats
            yield out

    return df.mapInPandas(_op, schema=IMAGE_FEATURES_SCHEMA)


def binary_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Checksum/size pass over binary payloads via the SAME Arrow-batched
    mapInPandas contract as the decode stages — but with no codec
    dependency, so unlike the stubbed decode it runs for real: this is
    the multimodal plumbing under a hard correctness check (byte counts
    and md5 digests are engine-reproducible). The dedup/integrity
    primitive for media corpora: digest once, compare digests ever
    after — the shuffle carries 32 hex chars, never payload bytes."""

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "_id": pdf[id_col],
                    "n_bytes": [len(b) for b in payloads],
                    "payload_md5": [
                        hashlib.md5(bytes(b)).hexdigest() for b in payloads
                    ],
                }
            )

    out_schema = f"_id {dict(df.dtypes)[id_col]}, n_bytes long, payload_md5 string"
    return df.mapInPandas(_op, schema=out_schema).withColumnRenamed("_id", id_col)


def sample_frames(df: DataFrame, every_n: int = 10,
                  frame_count_col: str = "frame_count") -> DataFrame:
    """Video frame-sampling plan: explode frame indices 0, n, 2n, ... per
    clip (decode itself is the stubbed stage downstream). Pure-Column —
    the explode multiplies rows JVM-side."""
    idx = F.sequence(
        F.lit(0), F.greatest(F.col(frame_count_col) - 1, F.lit(0)), F.lit(every_n)
    )
    return df.withColumn("frame_index", F.explode(idx))
