"""End-to-end pipeline driver: parse → enrich → route → fan-out → aggregate,
resumable per conversation-hash bucket.

Execution model (SURVEY.md §3.1 "Spark trace", §4.2):

1. **Stage (ingest pass)** — one shuffle: the raw transcript table is
   bucketed by ``pmod(xxhash64(conv_id), n_buckets)`` and written
   ``partitionBy(bucket)``.  This is the Store-ingest analog
   (``/root/reference/store/store.go:1136-1178``) and what an Iceberg
   table bucketed by conv_id gives for free; it buys *file-level
   partition pruning* for every later wave, so resuming bucket k never
   re-reads the other buckets — the property that matters at 100 TB.
   Within each bucket, files are split by a turn-level salt so a hot
   conversation (10% of all rows on one key) spreads across tasks for
   the narrow stages.
2. **Per-bucket wave** — scan only ``bucket=k`` files → vectorized
   parse (narrow) → broadcast-join enrich (narrow) → route (narrow) →
   ``persist()`` once → 4 sink writes + aggregate writes (the fan-out
   reads the routed frame once, mirroring ingest-once /
   reference-per-destination, ``store/store.go:1161-1177``) → manifest
   commit (the ACK).  A killed run leaves un-committed buckets; rerun
   with ``resume=True`` processes exactly those.
3. **Finalize** — per-bucket partial aggregate tables are summed
   (counts are associative) into the final metric tables.

``dropDuplicates(uid)`` inside a bucket is globally correct because the
uid is a function of (conv_id, turn_idx) and conv_id determines the
bucket — dedup never needs a global shuffle.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from skewer_spark.operators.aggregate import (
    filter_counts,
    incoming_counts,
    parse_error_counts,
    sink_counts,
    windowed_counts,
)
from skewer_spark.operators.enrich import enrich, with_turn_rank
from skewer_spark.operators.parse import parse_transcripts
from skewer_spark.operators.route import SINKS, route
from skewer_spark.plans import checkpoint as ckpt
from skewer_spark.sinks.encoders import with_encoded

SINK_COLUMNS = [
    "uid", "conv_id", "turn_idx", "turn_rank", "role", "tool", "ts",
    "priority", "facility", "severity", "facility_name", "severity_name",
    "version", "time_reported", "time_generated", "hostname", "appname",
    "procid", "msgid", "message", "properties", "parse_ok", "parser_name",
    "filter_status", "topic", "partition_key", "partition_number", "encoded",
]

AGG_TABLES = ("filter_counts", "sink_counts", "windowed_counts",
              "parse_error_counts", "incoming_counts")


def bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")


def stage_input(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    n_buckets: int,
    files_per_bucket: int = 8,
) -> str:
    """Ingest pass: bucket the raw table for partition-pruned waves."""
    staged = os.path.join(out_dir, "_staged")
    if os.path.exists(os.path.join(staged, "_SUCCESS")):
        return staged
    df = spark.read.parquet(input_path)
    df = df.withColumn("bucket", bucket_col(n_buckets))
    # salt the intra-bucket layout so one hot conv spans several files
    salt = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(files_per_bucket))
    (
        df.repartition(n_buckets * files_per_bucket, F.col("bucket"), salt)
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(staged)
    )
    return staged


def build_routed(df: DataFrame) -> DataFrame:
    """The logical plan for one slice of transcripts → routed rows."""
    parsed = parse_transcripts(df)
    parsed = parsed.dropDuplicates(["conv_id", "turn_idx"])
    enriched = with_turn_rank(enrich(parsed))
    return route(enriched)


def process_bucket(
    spark: SparkSession, staged: str, out_dir: str, bucket: int
) -> tuple[int, int]:
    src = spark.read.parquet(os.path.join(staged, f"bucket={bucket}"))
    routed = build_routed(src).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n_rows = routed.count()

        for name, pred in SINKS.items():
            sink_df = with_encoded(routed.filter(F.expr(pred)), name)
            cols = [c for c in SINK_COLUMNS if c in sink_df.columns]
            sink_df.select(*cols).write.mode("overwrite").parquet(
                os.path.join(out_dir, name, f"bucket={bucket}")
            )

        aggs = {
            "filter_counts": filter_counts(routed),
            "sink_counts": sink_counts(routed),
            "windowed_counts": windowed_counts(routed),
            "parse_error_counts": parse_error_counts(routed),
            "incoming_counts": incoming_counts(routed),
        }
        for name, adf in aggs.items():
            adf.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(out_dir, "agg", name, f"bucket={bucket}")
            )
        n_pass = routed.filter(F.col("filter_status") == "PASS").count()
        return n_rows, n_pass
    finally:
        routed.unpersist()


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    n_buckets: int = 8,
    resume: bool = True,
    fail_after: int | None = None,
    run_id: str | None = None,
) -> dict:
    run_id = run_id or uuid.uuid4().hex[:12]
    staged = stage_input(spark, input_path, out_dir, n_buckets)
    done = ckpt.committed_buckets(spark, out_dir) if resume else set()

    processed = 0
    for b in range(n_buckets):
        if b in done:
            continue
        with ckpt.Stopwatch() as sw:
            n_rows, n_pass = process_bucket(spark, staged, out_dir, b)
        ckpt.commit_bucket(spark, out_dir, run_id, b, n_rows, n_pass, sw.ms)
        processed += 1
        if fail_after is not None and processed >= fail_after:
            raise RuntimeError(f"injected failure after {processed} buckets")

    finalize_aggregates(spark, out_dir)
    man = ckpt.read_manifest(spark, out_dir)
    total = man.agg(F.sum("n_rows")).collect()[0][0]
    return {"run_id": run_id, "buckets": n_buckets, "rows": int(total or 0)}


_AGG_KEYS = {
    "filter_counts": ["filter_status", "role"],
    "sink_counts": ["sink", "severity_name"],
    "windowed_counts": ["window_start", "sink", "severity_name", "tool"],
    "parse_error_counts": ["parser_name"],
}


def finalize_aggregates(spark: SparkSession, out_dir: str) -> None:
    """Merge per-bucket partials (counts are associative)."""
    for name, keys in _AGG_KEYS.items():
        src = os.path.join(out_dir, "agg", name)
        try:
            df = spark.read.option("basePath", src).parquet(src)
        except Exception:
            continue
        val = "n_errors" if name == "parse_error_counts" else "n_messages"
        (
            df.groupBy(*keys)
            .agg(F.sum(val).alias(val))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "agg_final", name))
        )


def read_sink(spark: SparkSession, out_dir: str, name: str) -> DataFrame:
    path = os.path.join(out_dir, name)
    return spark.read.option("basePath", path).parquet(path)
