"""Multimodal (image/audio/video) column handling for training-data
pipelines.

Media travels as opaque ``binary`` columns plus typed metadata — the
Spark-side plumbing (schema, batch iteration, partition sizing) is real
and tested; the actual codec work is STUBBED behind a deterministic
fake because no image/audio libraries exist in this container.  Swap
``_decode_payload`` for a PIL/libav call on a real cluster; nothing
else changes.

Scale notes: media rows are huge (MBs) — these operators use
``mapInPandas`` so one Arrow batch streams through Python at a time
(never materialize a partition), and callers should size
``spark.sql.files.maxPartitionBytes`` down (e.g. 32 MB) so a partition
of media rows fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("media_type", T.StringType(), True),   # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("payload_sha", T.StringType(), True),
    T.StructField("features", T.ArrayType(T.FloatType()), True),
])


def synth_media(spark: SparkSession, n: int = 256, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table: payload = seeded bytes with a
    tiny fake header (type byte + dims) the decoder stub can parse."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                kind = ["image", "audio", "video"][int(i) % 3]
                w, h, dur = 16 + int(i) % 64, 16 + int(i) % 48, 1000 + int(i) % 9000
                rng = np.random.RandomState(int(i) % (2**31))
                body = rng.bytes(64 + int(i) % 192)
                header = bytes([int(i) % 3]) + w.to_bytes(2, "big") + h.to_bytes(2, "big")
                rows.append((int(i), int(i) // 4, kind, header + body, w, h, dur))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA.fields]
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_payload(payload: bytes) -> np.ndarray:
    """STUB decode: real systems call PIL/libav here.

    Deterministic fake: 8 float features from the payload digest —
    keeps the full pipeline testable (stable values, right shapes).
    """
    digest = hashlib.sha256(payload).digest()
    return np.frombuffer(digest[:32], dtype=np.uint8).reshape(8, 4).mean(axis=1) / 255.0


def extract_features(df: DataFrame) -> DataFrame:
    """media → per-item feature vector via Arrow-batched mapInPandas."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_payload(p).astype(np.float32).tolist()
                if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                "payload_sha": pdf["payload"].map(
                    lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                ),
                "features": feats,
            })

    return df.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize — STUB: raises until a codec library is present.

    The operator signature / partition plumbing is the real contract;
    plug PIL in ``_resize`` on a real cluster.
    """
    def _resize(payload: bytes) -> bytes:  # pragma: no cover - stub
        raise NotImplementedError(
            "image codec not available in this container; "
            "swap in PIL.Image.resize here"
        )

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": pdf["payload"].map(_resize),
            })

    return df.filter(F.col("media_type") == "image").mapInPandas(run, out_schema)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame_ts_ms", T.IntegerType(), False),
    T.StructField("frame_sha", T.StringType(), True),
])


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 32) -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp.

    The 1→N mapInPandas shape for frame extraction — each video row
    yields ``min(duration_ms // every_ms + 1, max_frames)`` frame rows.
    The frame *decode* is the stub (``frame_sha`` = digest of payload +
    frame index; a real cluster seeks the container with libav and
    emits the frame bytes) but the batch plumbing is the real contract:
    frames stream out per Arrow batch, so a 2-hour video never
    materializes all its frames in one Python list-of-rows.  At scale,
    follow with ``repartition(media_id)`` only if per-video grouping is
    needed — the sample itself is a narrow map."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_ts, out_sha = [], [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if payload is None or dur is None:
                    continue
                n = min(int(dur) // every_ms + 1, max_frames)
                for j in range(n):
                    out_ids.append(mid)
                    out_idx.append(j)
                    out_ts.append(j * every_ms)
                    out_sha.append(
                        hashlib.sha256(
                            payload + j.to_bytes(4, "big")
                        ).hexdigest()
                    )
            yield pd.DataFrame({
                "media_id": pd.Series(out_ids, dtype="int64"),
                "frame_idx": pd.Series(out_idx, dtype="int32"),
                "frame_ts_ms": pd.Series(out_ts, dtype="int32"),
                "frame_sha": pd.Series(out_sha, dtype="object"),
            })

    return df.filter(F.col("media_type") == "video").mapInPandas(run, FRAME_SCHEMA)


def media_dedup(df: DataFrame) -> DataFrame:
    """Exact media dedup by payload digest (sha over binary column)."""
    return (
        df.groupBy(F.sha2(F.col("payload"), 256).alias("payload_sha"))
        .agg(F.min("media_id").alias("keeper_id"), F.count("*").alias("n_copies"))
    )
