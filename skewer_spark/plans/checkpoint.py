"""Per-partition checkpoint / lineage manifest (SURVEY.md §2.6, §4.3).

Replaces the reference's badger durable queue (Ready → Sent → ACK,
``/root/reference/store/store.go:141-167, 1136-1470``) with the batch
contract: a conversation-hash **bucket** is the unit of work; a bucket's
rows count as delivered only once its sink files are fully written and
a manifest row is committed (the ACK).  A rerun skips committed buckets
and reprocesses the rest — combined with the deterministic uid this
gives effectively-once delivery (dominates the reference's
at-least-once + ULID dedup).

The manifest is an append-only parquet directory of single-row commits:
``(run_id, bucket, n_rows, n_pass, wall_ms, committed_at_run)``.
On Iceberg this would be the snapshot log; the parquet layout keeps the
identical semantics without the runtime jar.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType([
    T.StructField("run_id", T.StringType(), False),
    T.StructField("bucket", T.IntegerType(), False),
    T.StructField("n_rows", T.LongType(), False),
    T.StructField("n_pass", T.LongType(), False),
    T.StructField("wall_ms", T.LongType(), False),
])


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def committed_buckets(spark: SparkSession, out_dir: str) -> set[int]:
    path = manifest_path(out_dir)
    try:
        rows = spark.read.schema(MANIFEST_SCHEMA).parquet(path).select("bucket").collect()
    except Exception:
        return set()
    return {r.bucket for r in rows}


def commit_bucket(
    spark: SparkSession,
    out_dir: str,
    run_id: str,
    bucket: int,
    n_rows: int,
    n_pass: int,
    wall_ms: int,
) -> None:
    df = spark.createDataFrame(
        [(run_id, bucket, n_rows, n_pass, wall_ms)], MANIFEST_SCHEMA
    )
    df.coalesce(1).write.mode("append").parquet(manifest_path(out_dir))


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.schema(MANIFEST_SCHEMA).parquet(manifest_path(out_dir))


class Stopwatch:
    def __enter__(self):
        self.t0 = time.monotonic()
        return self

    def __exit__(self, *a):
        self.ms = int((time.monotonic() - self.t0) * 1000)
        return False
