"""Streaming incremental dedup (streaming/incdedup.py): stream-vs-batch
parity, retry idempotence, and the snapshot-diff consumer loop.

Pattern follows tests/test_streaming.py::test_stream_output_equals_batch:
the streaming path must produce byte-identical verdicts to the batch
loop over the same increments in the same order.
"""

from __future__ import annotations

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from skewer_spark.streaming.incdedup import (
    incremental_dedup_sequential,
    process_increment,
    read_corpus_sigs,
    run_incremental_dedup_stream,
    seed_corpus_sigs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


# three increments with cross-batch near-dups:
#  b0: four novel docs
#  b1: exact copy of a0 (must flag vs corpus) + one novel
#  b2: copy of the b1 novel, copy of a2, one novel
B0 = [
    ("a0", "the quick brown fox jumps over the lazy dog"),
    ("a1", "pack my box with five dozen liquor jugs"),
    ("a2", "how vexingly quick daft zebras jump today"),
    ("a3", "sphinx of black quartz judge my vow now"),
]
B1 = [
    ("b0", "the quick brown fox jumps over the lazy dog"),
    ("b1", "grumpy wizards make toxic brew for the evil queen"),
]
B2 = [
    ("c0", "grumpy wizards make toxic brew for the evil queen"),
    ("c1", "how vexingly quick daft zebras jump today"),
    ("c2", "completely fresh tokens appear nowhere else at all"),
]


def _write_stream_files(spark, input_dir):
    """One parquet FILE per increment, strictly increasing mtimes so the
    file stream's modification-time ordering is deterministic."""
    os.makedirs(input_dir, exist_ok=True)
    now = time.time()
    for i, rows in enumerate([B0, B1, B2]):
        tmp = os.path.join(input_dir, f"_tmp{i}")
        _docs(spark, rows).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.endswith(".parquet") and not f.startswith("_")
        )
        dst = os.path.join(input_dir, f"b{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (now + 20 * i, now + 20 * i))


def _verdicts(spark, work_dir):
    return sorted(
        tuple(r) for r in spark.read.option(
            "basePath", os.path.join(work_dir, "verdicts")
        ).parquet(os.path.join(work_dir, "verdicts"))
        .select("batch", "new_id", "best_corpus_id", "est_jaccard", "is_dup")
        .collect()
    )


def test_stream_verdicts_equal_batch_loop(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    _write_stream_files(spark, input_dir)

    stream_work = str(tmp_path / "stream")
    run_incremental_dedup_stream(spark, input_dir, stream_work)

    batch_work = str(tmp_path / "batch")
    incremental_dedup_sequential(
        [_docs(spark, b) for b in (B0, B1, B2)], batch_work
    )

    sv, bv = _verdicts(spark, stream_work), _verdicts(spark, batch_work)
    assert sv == bv
    by_id = {v[1]: v for v in sv}
    # cross-batch exact copies flagged against the FIRST committed copy
    assert by_id["b0"][4] and by_id["b0"][2] == "a0"
    assert by_id["c0"][4] and by_id["c0"][2] == "b1"
    assert by_id["c1"][4] and by_id["c1"][2] == "a2"
    # novel docs pass
    for d in ("a0", "a1", "a2", "a3", "b1", "c2"):
        assert not by_id[d][4]
    # duplicates never entered the signature store
    store = read_corpus_sigs(spark, os.path.join(stream_work, "corpus_sigs"), 99)
    assert sorted(r.doc_id for r in store.collect()) == [
        "a0", "a1", "a2", "a3", "b1", "c2",
    ]


def test_retry_is_idempotent(spark, tmp_path):
    """A retried increment must not dedup against its own failed
    partial signature write: rerunning batch 1 yields identical
    verdicts, NOT self-duplicates."""
    work = str(tmp_path / "w")
    process_increment(_docs(spark, B0), 0, work)
    process_increment(_docs(spark, B1), 1, work)
    first = _verdicts(spark, work)
    process_increment(_docs(spark, B1), 1, work)  # retry
    assert _verdicts(spark, work) == first
    store = read_corpus_sigs(spark, os.path.join(work, "corpus_sigs"), 99)
    assert store.filter(F.col("doc_id") == "b1").count() == 1


def test_seed_corpus(spark, tmp_path):
    """batch=-1 seed participates in every increment's corpus."""
    from skewer_spark.operators.dedup import minhash_signatures

    work = str(tmp_path / "w")
    seed = minhash_signatures(_docs(spark, B0), "text", "doc_id", 8)
    seed_corpus_sigs(seed, os.path.join(work, "corpus_sigs"))
    process_increment(_docs(spark, B1), 0, work)
    v = {r.new_id: r for r in spark.read.parquet(
        os.path.join(work, "verdicts", "batch=0")
    ).collect()}
    assert v["b0"].is_dup and v["b0"].best_corpus_id == "a0"
    assert not v["b1"].is_dup


def test_snapshot_diff_consumer(spark, tmp_path):
    """dedup_sink_increment: snapshot-to-snapshot appended rows flow
    through the same increment processor."""
    from skewer_spark.plans import checkpoint as ckpt
    from skewer_spark.plans.job import run_pipeline
    from skewer_spark.streaming.incdedup import dedup_sink_increment
    from skewer_spark.synth import write_transcripts

    tdir, out = str(tmp_path / "t"), str(tmp_path / "out")
    write_transcripts(spark, tdir, n_convs=6, turns_per_conv=10)
    # two snapshots: runA commits 1 of 2 buckets then crashes, the
    # partial state is checkpointed as s1, runB finishes → s2 (same
    # recipe as tests/test_timetravel.py)
    with pytest.raises(RuntimeError):
        run_pipeline(
            spark, tdir, out, n_buckets=2, fail_after=1, run_id="runA"
        )
    s1 = ckpt.commit_snapshot(spark, out, "runA")
    run_pipeline(spark, tdir, out, n_buckets=2, run_id="runB")
    snaps = {r.run_id: r for r in ckpt.read_snapshots(spark, out).collect()}
    work = str(tmp_path / "w")
    verdicts = dedup_sink_increment(
        spark, out, "sink_firehose",
        s1, snaps["runB"].snapshot_id, work, batch_id=0,
    )
    n = verdicts.count()
    assert n > 0
    assert verdicts.filter(F.col("new_id").isNull()).count() == 0


def test_corpus_read_prunes_batch_partitions(spark, tmp_path):
    """The batch < k corpus filter must reach the parquet scan as a
    PARTITION filter (directory pruning), not a post-scan row filter —
    at 10^12 docs the store holds thousands of batch directories and a
    retried batch must not even list the excluded ones' files."""
    import io
    import contextlib

    work = str(tmp_path / "w")
    process_increment(_docs(spark, B0), 0, work)
    process_increment(_docs(spark, B1), 1, work)
    corpus = read_corpus_sigs(spark, os.path.join(work, "corpus_sigs"), 1)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        corpus.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "batch" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]
    # and the pruned read returns exactly batch 0's novel docs
    assert sorted(r.doc_id for r in corpus.collect()) == [
        "a0", "a1", "a2", "a3",
    ]


def test_store_read_missing_empty_and_corrupt(spark, tmp_path):
    """The three store-read branches (ADVICE r4: existence via the
    Hadoop FileSystem API + structured error class, never message-text
    matching): a missing dir and a created-but-empty dir both mean "no
    corpus yet" (empty frame, right schema); a store holding a
    non-parquet file must RAISE — silently treating a broken store as
    empty would under-dedup every subsequent increment."""
    import pytest

    missing = str(tmp_path / "never_written")
    df = read_corpus_sigs(spark, missing, 5)
    assert df.count() == 0 and df.columns[0] == "doc_id"

    empty = str(tmp_path / "empty_dir")
    os.makedirs(empty)
    df = read_corpus_sigs(spark, empty, 5)
    assert df.count() == 0 and df.columns[0] == "doc_id"

    corrupt = str(tmp_path / "corrupt")
    os.makedirs(os.path.join(corrupt, "batch=0"))
    with open(os.path.join(corrupt, "batch=0", "part-0.parquet"), "wb") as f:
        f.write(b"this is not a parquet footer")
    with pytest.raises(Exception):
        read_corpus_sigs(spark, corrupt, 5).collect()
