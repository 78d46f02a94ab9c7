"""Streaming incremental MinHash dedup (VERDICT r3 "Next round" #7).

Closes the loop between the snapshot store's incremental reads
(``plans/job.read_sink_diff``) and the batch incremental-dedup operator
(``operators/dedup.incremental_dedup``): every arriving increment — a
Structured Streaming micro-batch, or the rows appended between two
committed snapshots — is judged against the ever-growing corpus
signature store, and the signatures of its novel documents are
committed back so the NEXT increment dedups against them.

This is the production shape of continuous corpus hygiene at 10^12
docs: corpus text is never re-read (only the ~0.5 KB/doc signature
table), each increment costs one new-batch signing pass plus two
narrow band joins, and the signature store is append-only with
batch-granular directories, so it rides the same
bucket-manifest/compaction machinery as the sinks.

Exactly-once / resume contract (the part that is easy to get wrong):

* each processed increment OVERWRITES its own ``batch=<id>``-scoped
  verdict and signature directories, so a retried micro-batch replaces
  its partial output instead of appending duplicates (same pattern as
  ``streaming.pipeline.write_sink_batch``);
* the corpus read for batch ``k`` filters to ``batch < k`` — a retried
  batch may find its OWN failed partial signature write on disk, and
  reading it would flag every retried doc as a duplicate of itself.
  The filter makes retries byte-deterministic instead (pinned by
  ``tests/test_streaming_incdedup.py::test_retry_is_idempotent``);
* a seed corpus (yesterday's signatures) loads under ``batch=-1`` so
  the filter admits it for every streamed batch.

Intra-batch semantics follow the batch operator's contract exactly:
an increment is judged against the COMMITTED corpus only, so two
copies of a novel doc arriving in the same micro-batch are both
"new" (and both enter the store).  Callers who need intra-batch
dedup run ``minhash_lsh_pairs`` on the increment first — keeping the
two concerns separate is what makes the streaming and batch paths
provably equal (``incremental_dedup_sequential`` is the shared loop).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from skewer_spark.operators.dedup import incremental_dedup, minhash_signatures

VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("new_id", T.StringType()),
        T.StructField("best_corpus_id", T.StringType()),
        T.StructField("est_jaccard", T.DoubleType()),
        T.StructField("is_dup", T.BooleanType()),
    ]
)


def _sig_schema(n_hashes: int) -> T.StructType:
    return T.StructType(
        [T.StructField("doc_id", T.StringType())]
        + [T.StructField(f"mh_{i}", T.StringType()) for i in range(n_hashes)]
    )


def read_corpus_sigs(
    spark: SparkSession,
    corpus_dir: str,
    before_batch: int,
    n_hashes: int = 8,
) -> DataFrame:
    """Committed signature store as of batch ``before_batch``
    (exclusive).  Missing/empty store → empty frame of the right
    schema, so the first increment dedups against nothing.

    The ``batch < before_batch`` filter is partition pruning on the
    directory layout — Spark never opens the excluded batches' files —
    and is also the retry-safety barrier (module docstring)."""
    from pyspark.errors import AnalysisException

    # Existence probed through the Hadoop FileSystem API rather than by
    # pattern-matching AnalysisException text — error-class strings vary
    # across Spark versions, and misclassifying a real read failure as
    # "no corpus yet" would silently under-dedup every increment
    # (ADVICE r4).  One driver-side RPC; no data is read.
    jpath = spark._jvm.org.apache.hadoop.fs.Path(corpus_dir)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return spark.createDataFrame([], _sig_schema(n_hashes))

    try:
        df = spark.read.option("basePath", corpus_dir).parquet(corpus_dir)
    except AnalysisException as e:
        # The dir exists but holds no parquet footers yet (created-empty
        # store).  Classify by the structured error class, not message
        # text; anything else (corrupt file, permission, bad schema)
        # must surface.
        klass = None
        for probe in ("getCondition", "getErrorClass"):
            fn = getattr(e, probe, None)
            if callable(fn):
                try:
                    klass = fn()
                except Exception:
                    klass = None
                if klass:
                    break
        if klass == "UNABLE_TO_INFER_SCHEMA":
            return spark.createDataFrame([], _sig_schema(n_hashes))
        raise
    return (
        df.filter(F.col("batch") < F.lit(before_batch))
        .select("doc_id", *[f"mh_{i}" for i in range(n_hashes)])
    )


def seed_corpus_sigs(sigs: DataFrame, corpus_dir: str) -> None:
    """Install a pre-existing signature table (the output of
    ``minhash_signatures`` on yesterday's corpus) under ``batch=-1``."""
    sigs.write.mode("overwrite").parquet(os.path.join(corpus_dir, "batch=-1"))


def process_increment(
    batch_df: DataFrame,
    batch_id: int,
    work_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    corpus_bucket_cap: int | None = 64,
) -> None:
    """Judge one increment against the store and commit its novel
    signatures — the foreachBatch body AND the batch-mode loop body
    (`incremental_dedup_sequential`), so stream-vs-batch parity is
    equality of two calls to THIS function, not of two
    implementations."""
    spark = batch_df.sparkSession
    n_hashes = bands * rows_per_band
    corpus_dir = os.path.join(work_dir, "corpus_sigs")
    corpus = read_corpus_sigs(spark, corpus_dir, batch_id, n_hashes)

    docs = batch_df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(text_col).cast("string").alias("text"),
    )
    # the increment is re-scanned by verdicts AND the novel-signature
    # leg below; micro-batches are bounded by definition, so pinning it
    # in memory beats recomputing the upstream (possibly a stream
    # source that cannot be replayed mid-batch)
    docs = docs.persist()
    try:
        verdicts = incremental_dedup(
            docs, corpus, "text", "doc_id", bands, rows_per_band,
            threshold, corpus_bucket_cap,
        )
        verdicts.write.mode("overwrite").parquet(
            os.path.join(work_dir, "verdicts", f"batch={batch_id}")
        )
        # novel docs only: duplicates must NOT enter the store, or the
        # store's bucket caps fill with copies of the same boilerplate
        novel = (
            spark.read.parquet(
                os.path.join(work_dir, "verdicts", f"batch={batch_id}")
            )
            .filter(~F.col("is_dup"))
            .select(F.col("new_id").alias("doc_id"))
        )
        sigs = minhash_signatures(docs, "text", "doc_id", n_hashes).join(
            novel, "doc_id", "left_semi"
        )
        sigs.write.mode("overwrite").parquet(
            os.path.join(corpus_dir, f"batch={batch_id}")
        )
    finally:
        docs.unpersist()


def run_incremental_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    work_dir: str,
    schema: T.StructType | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    corpus_bucket_cap: int | None = 64,
    max_files_per_trigger: int = 1,
):
    """File-stream (swap ``format("kafka")`` on a real bus) →
    ``foreachBatch(process_increment)``, available-now trigger: drains
    everything currently in ``input_dir`` then stops — the scheduled
    "dedup today's crawl" job shape.  Returns the finished query."""
    if schema is None:
        schema = T.StructType(
            [
                T.StructField(id_col, T.StringType()),
                T.StructField(text_col, T.StringType()),
            ]
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        process_increment(
            batch_df, batch_id, work_dir, text_col, id_col,
            bands, rows_per_band, threshold, corpus_bucket_cap,
        )

    q = (
        stream.writeStream.foreachBatch(_body)
        .option("checkpointLocation", os.path.join(work_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def incremental_dedup_sequential(
    batches: list[DataFrame],
    work_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    corpus_bucket_cap: int | None = 64,
    start_batch: int = 0,
) -> None:
    """Batch-mode twin: the same loop over explicit increment frames —
    used by the parity test, and by snapshot-diff consumers
    (:func:`dedup_sink_increment`) where the increments come from the
    store's lineage rather than a stream source."""
    for i, b in enumerate(batches):
        process_increment(
            b, start_batch + i, work_dir, text_col, id_col,
            bands, rows_per_band, threshold, corpus_bucket_cap,
        )


def dedup_sink_increment(
    spark: SparkSession,
    out_dir: str,
    sink: str,
    from_snapshot_id: str,
    to_snapshot_id: str,
    work_dir: str,
    batch_id: int,
    text_col: str = "encoded",
    id_col: str = "uid",
    **kw,
) -> DataFrame:
    """Consume a committed snapshot increment (``read_sink_diff``) as
    one dedup batch: the rows a sink appended between two snapshots are
    judged against the corpus store and their novel signatures
    committed — continuous corpus hygiene driven off the store's OWN
    lineage, no external stream infrastructure.  Returns the verdict
    frame for the increment."""
    from skewer_spark.plans.job import read_sink_diff

    inc = read_sink_diff(
        spark, out_dir, sink, from_snapshot_id, to_snapshot_id
    )
    process_increment(inc, batch_id, work_dir, text_col, id_col, **kw)
    return spark.read.parquet(
        os.path.join(work_dir, "verdicts", f"batch={batch_id}")
    )
