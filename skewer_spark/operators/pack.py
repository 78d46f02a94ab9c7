"""Sequence packing — the GPT-style concat-and-chunk step that turns a
curated document corpus into fixed-length training sequences.

The corpus is laid out as one deterministic token stream (documents in
``id`` order, whitespace tokens), and chunked into sequences of exactly
``seq_len`` tokens; each document is mapped to the half-open token span
``[start, start + n_tokens)`` of that stream and hence to the sequence
ids it occupies.  No reference analog (the reference is a log gateway);
this is part of the training-data-pipeline surface.

Scale note — the global running total is a textbook distributed prefix
sum, NOT a single-partition window: an all-rows ``Window.orderBy(id)``
collapses the whole corpus onto one task, which is exactly the
straggler this module exists to avoid.  Instead:

1. each row gets a RANGE-bucket id via a monotone map of the order key
   (min/max come from a broadcast 1-row aggregate — no driver collect,
   no action);
2. in-bucket running totals use a window partitioned by bucket
   (parallel across buckets);
3. bucket base offsets are a global window over the ``n_buckets``-row
   totals frame (trivially small), broadcast-joined back.

Integer arithmetic throughout — the bucketed prefix sum is bit-equal to
the single-partition formulation regardless of bucket boundaries, which
is what the DuckDB oracle (plain global window cumsum) checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    seq_len: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Assign every document its token span in the packed stream.

    Returns one row per input document::

        (id, n_tokens, seq_first, seq_last, offset_in_seq)

    where ``seq_first``/``seq_last`` are the first and last sequence
    ids the document's tokens land in (a document longer than
    ``seq_len`` spans several), and ``offset_in_seq`` is the token
    offset of the document's first token inside ``seq_first``.
    """
    from skewer_spark.functions.text import token_count

    # token_count = pure length arithmetic (identical value to
    # size(split(t, ' ')), incl. empty segments) — no per-row token
    # array materialized just to take its size
    base = df.select(
        F.col(id_col).cast("long").alias(id_col),
        token_count(text_col).alias("n_tokens"),
    )
    # monotone bucket id via SAMPLED range partitioning on the id (the
    # token_budget_select tie_safe shape; ids are unique so there is no
    # tie concern): all docs in bucket b precede bucket b+1 in id
    # order, so per-bucket partial sums + bucket base offsets reproduce
    # the global cumsum exactly.  The earlier broadcast-min/max value
    # map `(id - lo) * n / (hi - lo + 1)` is NOT safe here: doc ids are
    # often 64-bit hashes, where `(id - lo)` alone wraps int64 (ANSI
    # mode → job-killing ArithmeticException; non-ANSI → silently
    # non-monotone buckets = wrong offsets), and clustered/sparse ids
    # collapse ~all rows into one bucket — the single-task straggler
    # this operator exists to avoid.  Range boundaries come from a
    # sample of the actual ids, so they stay balanced for ANY id
    # distribution and never do arithmetic on the id domain.
    bucketed = base.repartitionByRange(
        n_buckets, F.col(id_col)
    ).select(
        id_col, "n_tokens", F.spark_partition_id().alias("_bkt")
    )
    in_bucket = F.sum("n_tokens").over(
        Window.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rows = bucketed.withColumn("_run", in_bucket)
    bucket_totals = rows.groupBy("_bkt").agg(
        F.max("_run").alias("_tot")
    )
    # n_buckets rows: the one intentionally-global window in the plan
    base_off = bucket_totals.select(
        "_bkt",
        (
            F.coalesce(
                F.sum("_tot").over(
                    Window.orderBy("_bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            )
        ).alias("_base"),
    )
    start = F.col("_base") + F.col("_run") - F.col("n_tokens")
    end = F.col("_base") + F.col("_run")
    return (
        rows.join(F.broadcast(base_off), "_bkt")
        .select(
            id_col,
            "n_tokens",
            F.floor(start / seq_len).alias("seq_first"),
            F.floor((end - 1) / seq_len).alias("seq_last"),
            (start % seq_len).cast("int").alias("offset_in_seq"),
        )
    )


def sequence_manifest(
    packed: DataFrame,
    seq_len: int = 512,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-sequence roll-up of :func:`pack_sequences` output:
    ``(seq_id, n_docs, n_tokens)`` with each document's token count
    clipped to the sequence boundaries (so every full sequence sums to
    exactly ``seq_len`` tokens).

    One sequence-id explode (a document emits ``seq_last - seq_first
    + 1`` rows — bounded by ``n_tokens / seq_len + 1``) and one
    compact-key aggregate.
    """
    start = (
        F.col("seq_first") * seq_len + F.col("offset_in_seq")
    ).alias("_start")
    span = packed.select(
        id_col,
        "n_tokens",
        F.explode(
            F.sequence(F.col("seq_first"), F.col("seq_last"))
        ).alias("seq_id"),
        start,
    )
    contrib = F.least(
        (F.col("seq_id") + 1) * seq_len, F.col("_start") + F.col("n_tokens")
    ) - F.greatest(F.col("seq_id") * seq_len, F.col("_start"))
    return (
        span.groupBy("seq_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(contrib).cast("long").alias("n_tokens"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document sliding-window chunking — the RAG / long-document
    prep step that cuts each doc into ``chunk_tokens``-token windows
    with ``overlap`` tokens carried between consecutive chunks
    (stride = chunk_tokens - overlap).

    Chunk starts are ``0, stride, 2·stride, …`` while
    ``start < max(n_tokens - overlap, 1)``: every chunk after the first
    contributes at least one NEW token (no chunk is fully contained in
    its predecessor), the final chunk may be short, and coverage is
    total.  Docs with no tokens yield no chunks.

    Returns ``(id_col, chunk_idx, n_tokens, chunk_text)``.

    Scale shape: narrow map + one ``posexplode`` — zero shuffles; the
    per-doc fan-out is ceil(max(n-overlap,1)/stride) rows, linear in
    doc length.  Unlike :func:`pack_sequences` (one global stream,
    cross-doc packing, distributed prefix sum) this is embarrassingly
    parallel because windows never cross documents.
    """
    if overlap < 0 or overlap >= chunk_tokens:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < chunk_tokens "
            f"(got overlap={overlap}, chunk_tokens={chunk_tokens})"
        )
    stride = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    base = (
        df.select(F.col(id_col), toks.alias("_toks"))
        .withColumn("_n", F.size("_toks"))
        .filter(F.col("_n") > 0)
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("_n") - overlap - 1, F.lit(0)),
        F.lit(stride),
    )
    return base.select(
        id_col,
        F.posexplode(starts).alias("chunk_idx", "_start"),
        "_toks",
        "_n",
    ).select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.least(F.lit(chunk_tokens), F.col("_n") - F.col("_start"))
        .cast("int")
        .alias("n_tokens"),
        F.concat_ws(
            " ", F.slice("_toks", F.col("_start") + 1, chunk_tokens)
        ).alias("chunk_text"),
    )


def sft_turn_spans(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    loss_roles: tuple[str, ...] = ("assistant",),
) -> DataFrame:
    """SFT loss-mask layout: per turn, its token span inside the
    conversation's packed sequence plus the loss mask — the data-prep
    step between raw transcripts and supervised fine-tuning, where the
    model must SEE every turn but only LEARN on the assistant's.

    Returns ``(conv, turn, role, start_tok, end_tok, n_tok,
    loss_mask)`` with ``start_tok`` = 0-based offset of the turn's
    first token when the conversation's turns are concatenated in
    ``order_col`` order, ``end_tok`` exclusive, and ``loss_mask`` true
    iff ``role ∈ loss_roles``.  Token counts are whitespace tokens
    (the :mod:`..functions.text` contract); swap in
    ``apply_bpe_pandas`` lengths for tokenizer-exact spans.

    Scale shape (the 100 TB contract): offsets are a running sum over
    ONE window partitioned by ``conv`` — conversations are bounded
    (they fit one task by definition of the transcript data model;
    the hot-conv skew guard lives upstream in ``dedup_and_rank``),
    so no corpus-global window and no prefix-sum machinery is needed
    (contrast :func:`pack_sequences`, which packs ACROSS document
    boundaries and therefore does need the distributed prefix sum).
    An empty-but-present turn counts ONE token (the length-arithmetic
    whitespace contract shared with the q_text_stats oracle); a NULL
    text gets ``n_tok`` 0 and a degenerate (start == end) span —
    either way the turn is never dropped (the route.py
    no-message-lost stance)."""
    from ..functions.text import token_count

    w = (
        Window.partitionBy("conv")
        .orderBy("turn")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_tok = F.coalesce(token_count(text_col), F.lit(0))
    out = df.select(
        F.col(conv_col).alias("conv"),
        F.col(order_col).alias("turn"),
        F.col(role_col).alias("role"),
        n_tok.cast("long").alias("n_tok"),
    )
    return out.select(
        "conv",
        "turn",
        "role",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("start_tok"),
        (F.coalesce(F.sum("n_tok").over(w), F.lit(0)) + F.col("n_tok")).alias(
            "end_tok"
        ),
        "n_tok",
        F.col("role").isin(*loss_roles).alias("loss_mask"),
    )
