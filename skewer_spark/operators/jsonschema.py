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
* ``cast(variant AS map<string,variant>)`` inside nested ``transform``
  lambdas enumerates keys; ``schema_of_variant`` is a per-row scalar
  function returning each value's type, normalized here to a 7-value
  engine-neutral taxonomy (string/int/float/bool/null/object/array) so
  a DuckDB ``json_type`` oracle can mirror it exactly.
* nesting is walked to a FIXED depth (default 2) inside ONE
  expression: a depth-unrolled nested transform emits every
  (path, type) entry of a row at once.  Fixed depth keeps the plan
  static (no driver-side recursion over data) and bounds entry fan-out
  at the row's total key count per level.

Scale shape: one corpus scan (plan-pinned — a per-level frame union
would re-scan once per level) → one projection + ONE explode → ONE
partial-aggregable ``groupBy(path, vtype)`` on compact key rows (the
JSON text itself never shuffles).  The result frame is
O(#distinct paths × types) — tiny — so the drift join is trivially
broadcast.

Key names are emitted verbatim in dotted paths (``$.meta.u``) except
that the internal ``\\x01`` sentinel byte is stripped from keys; keys
containing ``.`` / ``[`` would be ambiguous in path notation — fine
for telemetry bags, documented limitation (same as DuckDB's
``json_keys`` path addressing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


#: engine-neutral value-type taxonomy shared with the DuckDB oracle
TYPE_TAXONOMY = ("string", "int", "float", "bool", "null", "object", "array")


def _norm_variant_type(t: Column) -> Column:
    """Normalize ``schema_of_variant`` output to the shared taxonomy.

    Numerics follow variant's VALUE canonicalization, and the taxonomy
    inherits it deliberately (pinned by the randomized reference test):

    * plain integers ≤ int64 → BIGINT → ``int``;
    * bigger non-exponent integrals (≤ 38 digits) → DECIMAL(p,0) →
      ``int``;
    * **integral-valued decimal text like ``5.0`` or ``1000.0`` also
      canonicalizes to DECIMAL(p,0) → ``int``** — variant stores the
      number, not its spelling;
    * fractional decimals → DECIMAL(p,s>0) → ``float``; exponent forms
      (``1e30``) and > 38-digit numbers → DOUBLE → ``float``.

    A DuckDB ``json_type`` oracle types ``5.0`` as DOUBLE, so oracle
    fixtures must avoid integral-float spellings (or classify numerics
    by raw text) — the shipped ``q_json_schema`` fixture does.
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

    sep = "\x01"  # path/vtype sentinel (never in JSON keys/types)
    empty = F.array().cast("array<string>")

    # strict variant→map cast throws on non-object values; the CASE
    # guard evaluates lazily, so arrays/scalars at any level yield NULL
    # (map_entries(NULL) → NULL → coalesce to empty) instead of a task
    # failure
    def _members(val: Column) -> Column:
        return F.when(
            F.schema_of_variant(val).startswith("OBJECT"),
            val.cast("map<string, variant>"),
        )

    # one nested-transform expression emits EVERY (path, vtype) entry
    # of a row — the value's own type plus, for objects, its members'
    # entries down to the fixed depth.  A per-level union of frames
    # would re-scan the corpus once per level (plan-pinned single-scan
    # in tests/test_plans.py); this shape is one projection + ONE
    # explode regardless of depth.
    def _entries(val: Column, path: Column, depth: int) -> Column:
        own = F.array(
            F.concat(
                path,
                F.lit(sep),
                _norm_variant_type(F.schema_of_variant(val)),
            )
        )
        if depth <= 0:
            return own
        child = F.flatten(
            F.transform(
                F.map_entries(_members(val)),
                # keys are sanitized of the sentinel byte: a key
                # containing \\x01 would otherwise truncate the path at
                # the split (JSON allows any control char in keys)
                lambda e: _entries(
                    e["value"],
                    F.concat(
                        path, F.lit("."), F.translate(e["key"], sep, "")
                    ),
                    depth - 1,
                ),
            )
        )
        return F.concat(own, F.coalesce(child, empty))

    all_entries = F.when(
        v.isNull(), F.array(F.lit("$" + sep + "malformed"))
    ).otherwise(_entries(v, F.lit("$"), max_depth))

    hist = src.select(F.explode(all_entries).alias("_e")).select(
        F.substring_index("_e", sep, 1).alias("path"),
        F.substring_index("_e", sep, -1).alias("vtype"),
    )
    counts = hist.groupBy("path", "vtype").agg(F.count("*").alias("n"))
    # the frac denominator comes from the histogram itself — the root
    # level emits exactly one row per non-null input, so total =
    # Σ n over path='$'.  A separate src.agg(count) would be a SECOND
    # corpus scan (plan-pinned single-scan in tests/test_plans.py); the
    # unpartitioned window runs on the tiny (paths × types) frame only.
    total = F.sum(
        F.when(F.col("path") == "$", F.col("n")).otherwise(F.lit(0))
    ).over(Window.partitionBy())
    return counts.select(
        "path",
        "vtype",
        "n",
        F.round(F.col("n") / total, 6).alias("frac"),
    )


def json_schema_drift(
    old: DataFrame, new: DataFrame, min_frac: float = 0.0
) -> DataFrame:
    """Compare two ``infer_json_schema`` outputs.

    Returns ``(path, vtype, old_frac, new_frac, status)`` where status ∈
    ``added`` (path×type seen only in ``new``), ``removed`` (only in
    ``old``), ``shifted`` (both, coverage changed), ``same`` (both,
    coverage unchanged — kept so consumers can distinguish "stable"
    from "absent", filter on status != 'same' for an alert feed).
    Both inputs are O(paths × types) frames, so the full-outer join is
    trivially small; ``min_frac`` drops noise paths below a coverage
    floor on both sides.
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
        .when(F.col("old_frac") == F.col("new_frac"), F.lit("same"))
        .otherwise(F.lit("shifted"))
        .alias("status"),
    )
