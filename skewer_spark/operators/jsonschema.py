"""JSON schema inference + drift detection over semi-structured bags.

Log pipelines carry schemaless JSON payloads everywhere — rsyslog's
``$!`` property bag (reference: ``model/rsyslog.go``, the ``-``
sentinel dict), GELF ``_extra`` fields, and the ``props`` column of our
events table.  At 100 TB nobody can eyeball what keys producers
actually send; the operational questions are "what paths exist, with
what value types, at what coverage?" and "did yesterday's deploy change
a type or add a path?" (schema drift — the classic silent breaker of
downstream parsers).

This module answers both with PURE JVM expressions via Spark 4's
VARIANT type — no Python in the hot path:

* ``try_parse_json`` → binary variant (malformed rows become NULL, we
  count them instead of failing the job — the per-line-data-problem
  contract shared with the decoders).
* ``cast(variant AS map<string,variant>)`` + ``explode`` enumerates
  keys; ``schema_of_variant`` is a per-row scalar function returning
  each value's type, normalized here to a 7-value engine-neutral
  taxonomy (string/int/float/bool/null/object/array) so a DuckDB
  ``json_type`` oracle can mirror it exactly.
* nesting is walked to a FIXED depth (default 2): each level is one
  ``explode`` over the previous level's object-typed values.  Fixed
  depth keeps the plan static (no driver-side recursion over data) and
  bounds row fan-out at Σ |keys at level d| per input row.

Scale shape: one narrow scan → ≤ ``max_depth`` explode generates →
ONE partial-aggregable ``groupBy(path, vtype)`` on compact key rows
(the JSON text itself never shuffles).  The result frame is
O(#distinct paths × types) — tiny — so the drift join is trivially
broadcast.

Key names are emitted verbatim in dotted paths (``$.meta.u``); keys
containing ``.`` / ``[`` would be ambiguous in path notation — fine
for telemetry bags, documented limitation (same as DuckDB's
``json_keys`` path addressing).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: engine-neutral value-type taxonomy shared with the DuckDB oracle
TYPE_TAXONOMY = ("string", "int", "float", "bool", "null", "object", "array")


def _norm_variant_type(t: Column) -> Column:
    """Normalize ``schema_of_variant`` output to the shared taxonomy.

    Spark variant types JSON numbers as BIGINT (integral) or
    DECIMAL(p,s)/DOUBLE (fractional / exponent forms); DECIMAL with
    scale 0 is still an integral literal (e.g. ``1e2``) and maps to
    ``int`` exactly like DuckDB's UBIGINT/BIGINT for the same text.
    """
    return (
        F.when(t.startswith("OBJECT"), F.lit("object"))
        .when(t.startswith("ARRAY"), F.lit("array"))
        .when(t == "STRING", F.lit("string"))
        .when(t == "BOOLEAN", F.lit("bool"))
        .when(t == "VOID", F.lit("null"))
        .when(
            t.rlike(r"^(TINYINT|SMALLINT|INT|BIGINT|DECIMAL\(\d+,0\))$"),
            F.lit("int"),
        )
        .when(
            t.rlike(r"^(FLOAT|DOUBLE|DECIMAL\(\d+,\d+\))$"), F.lit("float")
        )
        .otherwise(F.lit("other"))
    )


def infer_json_schema(
    df: DataFrame,
    json_col: str = "props",
    max_depth: int = 2,
) -> DataFrame:
    """Per-path value-type histogram of a JSON-text column.

    Returns ``(path, vtype, n, frac)`` sorted semantics-free (caller
    orders), where ``path`` is ``$`` for the root and ``$.a.b`` for
    nested members, ``vtype`` ∈ taxonomy ∪ {``malformed``}, ``n`` the
    number of rows carrying that (path, type), and ``frac`` = n /
    non-null input rows rounded to 6 dp.  A path whose value is an
    object contributes its own ``object`` row AND its members' rows at
    the next level, so coverage of optional nested keys is read
    directly off ``frac``.

    Rows where ``json_col`` IS NULL are excluded (no payload ≠ broken
    payload); non-NULL text that fails to parse counts as
    ``($, malformed)``.
    """
    if max_depth < 1:
        raise ValueError("max_depth must be >= 1")

    src = df.filter(F.col(json_col).isNotNull())
    v = F.try_parse_json(F.col(json_col))

    # root row: malformed text, or the root value's own type
    root = src.select(
        F.lit("$").alias("path"),
        F.when(v.isNull(), F.lit("malformed"))
        .otherwise(_norm_variant_type(F.schema_of_variant(v)))
        .alias("vtype"),
    )

    levels = [root]

    # strict variant→map cast throws on non-object values; the CASE
    # guard evaluates lazily, so arrays/scalars at any level yield NULL
    # (explode of NULL = no rows) instead of a task failure
    def _members(val: Column) -> Column:
        return F.when(
            F.schema_of_variant(val).startswith("OBJECT"),
            val.cast("map<string, variant>"),
        )

    # (path, val) pairs of the current level's OBJECT members
    cur = src.select(
        F.lit("$").alias("path"),
        F.explode(_members(v)).alias("key", "val"),
    ).select(
        F.concat_ws(".", "path", "key").alias("path"), "val"
    )
    for depth in range(max_depth):
        t = F.schema_of_variant(F.col("val"))
        levels.append(
            cur.select("path", _norm_variant_type(t).alias("vtype"))
        )
        if depth + 1 < max_depth:
            cur = cur.select(
                "path",
                F.explode(_members(F.col("val"))).alias("key", "val"),
            ).select(F.concat_ws(".", "path", "key").alias("path"), "val")

    hist = reduce(lambda a, b: a.unionByName(b), levels)
    counts = hist.groupBy("path", "vtype").agg(F.count("*").alias("n"))
    # scalar total broadcast: the 1-row agg frame joins the tiny
    # (paths × types) result, never the corpus
    total = src.agg(F.count("*").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "path",
            "vtype",
            "n",
            F.round(F.col("n") / F.col("_total"), 6).alias("frac"),
        )
    )


def json_schema_drift(
    old: DataFrame, new: DataFrame, min_frac: float = 0.0
) -> DataFrame:
    """Compare two ``infer_json_schema`` outputs.

    Returns ``(path, vtype, old_frac, new_frac, status)`` where status ∈
    ``added`` (path×type seen only in ``new``), ``removed`` (only in
    ``old``), ``shifted`` (both, coverage changed).  Both inputs are
    O(paths × types) frames, so the full-outer join is trivially small;
    ``min_frac`` drops noise paths below a coverage floor on both
    sides.
    """
    o = old.select(
        "path", "vtype", F.col("frac").alias("old_frac")
    ).filter(F.col("old_frac") >= min_frac)
    n = new.select(
        "path", "vtype", F.col("frac").alias("new_frac")
    ).filter(F.col("new_frac") >= min_frac)
    j = o.join(n, ["path", "vtype"], "full_outer")
    return j.select(
        "path",
        "vtype",
        "old_frac",
        "new_frac",
        F.when(F.col("old_frac").isNull(), F.lit("added"))
        .when(F.col("new_frac").isNull(), F.lit("removed"))
        .otherwise(F.lit("shifted"))
        .alias("status"),
    )
