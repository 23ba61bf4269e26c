"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video payloads are ``binary`` columns travelling next
to typed metadata (mime, width/height, duration, sample rate). Decode /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so the
bytes never round-trip through Python row-at-a-time, and partition sizing
is controlled by ``spark.sql.files.maxPartitionBytes`` on the read side.

Codec status: formats whose containers need no external library decode
FOR REAL — uncompressed BMP images (:func:`decode_bmp`, struct + numpy
over the pixel array) and PCM WAV audio (:func:`decode_wav`, stdlib
``wave``) — through the same Arrow-batched stages. Compressed formats
(JPEG/PNG/MP4) are STUBBED: ``_decode_image_bytes`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic
fake (derived from the payload hash) stands in so the Spark-side
plumbing — schema, batching, UDF signatures — is fully real and
testable. Swap the stub for PIL/torchaudio/ffmpeg calls in a real
deployment; nothing else changes.
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


BMP_DECODE_SCHEMA = (
    "path string, width int, height int, bpp int, mean_lum double"
)
WAV_DECODE_SCHEMA = (
    "path string, sample_rate int, n_channels int, n_samples bigint, "
    "rms double"
)


def _parse_bmp(b: bytes) -> tuple[int, int, int, float]:
    """REAL decode of an uncompressed (BI_RGB) 24/32-bit BMP: header
    fields via struct, pixel array via one numpy view (row padding
    stripped), mean byte luminance as the summary feature."""
    import struct

    import numpy as np

    if bytes(b[:2]) != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", b, 10)[0]
    width = struct.unpack_from("<i", b, 18)[0]
    height_raw = struct.unpack_from("<i", b, 22)[0]
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            "only uncompressed 24/32-bit BMP decodes without codec libs"
        )
    height = abs(height_raw)
    row_bytes = (width * bpp // 8 + 3) & ~3
    px = np.frombuffer(
        bytes(b), dtype=np.uint8, count=row_bytes * height, offset=off
    ).reshape(height, row_bytes)[:, : width * bpp // 8]
    return width, height, bpp, float(px.mean()) if px.size else 0.0


def decode_bmp(df: DataFrame, payload_col: str = "content") -> DataFrame:
    """Real image decode for the library-free format: BMP payloads ->
    (width, height, bpp, mean luminance), Arrow batch at a time. The
    NON-stubbed proof of the decode stage contract."""

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_parse_bmp(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "bpp": [r[2] for r in rows],
                    "mean_lum": [r[3] for r in rows],
                }
            )

    return df.mapInPandas(_op, schema=BMP_DECODE_SCHEMA)


def _parse_wav(b: bytes) -> tuple[int, int, int, float]:
    """REAL decode of PCM16 WAV via the stdlib wave reader: sample
    rate, channels, frame count, and signal RMS."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(bytes(b))) as wf:
        sr = wf.getframerate()
        ch = wf.getnchannels()
        n = wf.getnframes()
        if wf.getsampwidth() != 2:
            raise NotImplementedError("PCM16 WAV only")
        raw = wf.readframes(n)
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    rms = float(np.sqrt((x * x).mean())) if x.size else 0.0
    return sr, ch, n, rms


def decode_wav(df: DataFrame, payload_col: str = "content") -> DataFrame:
    """Real audio decode (PCM WAV) -> (sample_rate, channels, frames,
    RMS), Arrow batch at a time."""

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_parse_wav(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "sample_rate": [r[0] for r in rows],
                    "n_channels": [r[1] for r in rows],
                    "n_samples": [r[2] for r in rows],
                    "rms": [r[3] for r in rows],
                }
            )

    return df.mapInPandas(_op, schema=WAV_DECODE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10,
                  frame_count_col: str = "frame_count") -> DataFrame:
    """Video frame-sampling plan: explode frame indices 0, n, 2n, ... per
    clip (decode itself is the stubbed stage downstream). Pure-Column —
    the explode multiplies rows JVM-side."""
    idx = F.sequence(
        F.lit(0), F.greatest(F.col(frame_count_col) - 1, F.lit(0)), F.lit(every_n)
    )
    return df.withColumn("frame_index", F.explode(idx))
