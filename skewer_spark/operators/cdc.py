"""CDC merge — MERGE INTO / upsert semantics for the routed sinks.

The reference's store is strictly append + ack (messages are immutable
once committed, ``/root/reference/store/store.go``); a lakehouse sink
additionally needs the Iceberg ``MERGE INTO`` shape: apply a change
log (inserts / updates / deletes keyed by uid) to a committed table,
e.g. GDPR erasure, late corrections, or dimension maintenance over the
transcript lake.  These operators provide that as pure DataFrame
plans; pair them with :mod:`skewer_spark.plans.checkpoint` snapshots
for the copy-on-write commit.

Scale shape: both operators are ONE hash exchange on the merge key —
never a per-key collect, never a driver loop.  ``apply_cdc_log``
resolves the winning change with a partial-aggregable ``max_by``
(map-side combine on hot keys) and joins it to the base as a normal
shuffled hash join (broadcast if the change batch is small — typical
CDC batches are << base, and Catalyst/AQE picks that up from stats).
``scd2_history`` is one window over the key exchange; change-collapse
(drop no-op rows) happens BEFORE validity stamping so reruns of an
idempotent feed don't fragment validity ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

OP_INSERT, OP_UPDATE, OP_DELETE = "I", "U", "D"


def latest_changes(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """One winning change row per key: max (ts, seq) wins.

    ``seq_col`` breaks same-timestamp ties (a CDC stream's log offset);
    without one, ties resolve deterministically by the op string (D >
    U > I lexically inverted is meaningless — so we require either
    distinct timestamps or a seq column and make ties DETERMINISTIC by
    ordering on the op last).  Partial-aggregable: ``max_by`` combines
    map-side, so one hot key never funnels its full history to a task.

    Every change row's op is validated inline (narrow expression riding
    the scan): a NULL/unknown op raises instead of being silently
    ignored — downstream, a NULL op from the full-outer join MEANS "key
    has no changes", so an unvalidated NULL op in the log would make an
    insert vanish and an update not apply, with no error and no metric
    (the store contract is fail-loud).  The check replaces the op
    column itself so column pruning can never drop it.
    """
    valid = F.col(op_col).isin(OP_INSERT, OP_UPDATE, OP_DELETE)
    changes = changes.withColumn(
        op_col,
        F.when(valid, F.col(op_col)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"cdc: invalid {op_col!r} value "),
                    F.coalesce(F.col(op_col), F.lit("NULL")),
                    F.lit(" (expected I/U/D)"),
                )
            )
        ),
    )
    ordkey = F.struct(
        F.col(ts_col),
        (F.col(seq_col) if seq_col else F.lit(0)).alias("_seq"),
        F.col(op_col).alias("_op_tb"),
    )
    payload = F.struct(*[
        F.col(c) for c in changes.columns if c not in key_cols
    ])
    won = changes.groupBy(*key_cols).agg(
        F.max_by(payload, ordkey).alias("_chg")
    )
    return won.select(*key_cols, "_chg.*")


def apply_cdc_log(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """MERGE INTO analog: apply the latest change per key to ``base``.

    * latest op ``D`` → key removed (even if absent from base: no-op)
    * latest op ``U``/``I`` → row upserted (replaces the base row or
      inserts a new key)
    * keys without changes pass through untouched

    ``changes`` must carry the base's non-key columns plus
    ``(ts_col, op_col)``.  Output schema == base schema.  The whole
    merge is one groupBy(key) + one join — the copy-on-write MERGE
    plan; at table scale, partition-prune the base scan to the
    partitions the change keys touch before calling (Iceberg's
    merge-on-read does the same pruning).
    """
    data_cols = [c for c in base.columns if c not in key_cols]
    missing = [
        c for c in data_cols if c not in changes.columns
    ]
    if missing:
        raise ValueError(f"changes missing base columns: {missing}")
    meta = [ts_col, op_col] + ([seq_col] if seq_col else [])
    win = latest_changes(
        changes.select(
            *key_cols, *meta, *[c for c in data_cols if c not in meta]
        ),
        key_cols,
        ts_col,
        op_col,
        seq_col,
    )
    # presence of a base row is detected via an explicit marker, not a
    # nullable data column
    joined = base.withColumn("_inbase", F.lit(True)).alias("b").join(
        win.alias("c"), key_cols, "full_outer"
    )
    is_del = F.col(f"c.{op_col}") == OP_DELETE
    has_chg = F.col(f"c.{op_col}").isNotNull()
    keep = F.when(has_chg, ~is_del).otherwise(
        F.col("b._inbase").isNotNull()
    )
    out_cols = [F.col(k) for k in key_cols] + [
        F.when(has_chg & ~is_del, F.col(f"c.{c}"))
        .otherwise(F.col(f"b.{c}"))
        .alias(c)
        for c in data_cols
    ]
    return joined.filter(keep).select(*out_cols)


def scd2_history(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    attr_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type 2: per key, the attribute change
    history as ``(key…, attrs…, valid_from, valid_to, is_current)``.

    Consecutive rows with unchanged attributes collapse (idempotent
    feeds don't fragment ranges); ``valid_to`` is the next change's
    timestamp, NULL on the current row.  One exchange on the key; ties
    on ``ts_col`` within a key are broken by the attr struct so the
    history is deterministic.
    """
    attr_cols = attr_cols or [
        c for c in events.columns if c not in key_cols and c != ts_col
    ]
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col), attrs)
    changed = events.select(
        *key_cols, ts_col, *attr_cols
    ).withColumn("_prev", F.lag(attrs).over(w)).filter(
        F.col("_prev").isNull() | (F.col("_prev") != attrs)
    )
    w2 = Window.partitionBy(*key_cols).orderBy(F.col(ts_col), attrs)
    return changed.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
