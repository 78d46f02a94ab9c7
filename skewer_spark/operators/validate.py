"""Data-contract validation: declarative expectations, one-scan audit.

Before a 100 TB table feeds training (or a snapshot commits), the
pipeline asserts its contract: required columns non-null, values in
range/set, keys unique.  The Great-Expectations-shaped idea, stripped
to what a Spark batch gate needs: a RULE LIST evaluated in a single
corpus scan, producing one compact row per rule — never one pass per
rule, never a collected sample.

Two rule kinds:

* **row rules** — ``(name, boolean Column)``: a row violates the rule
  when the predicate is false OR null (SQL three-valued logic is
  collapsed fail-closed: an un-evaluable expectation is a violation —
  the gate must never pass data it could not check);
* **uniqueness rules** — column (sets) whose violation count is
  ``count(*) - count_distinct(cols)``.  Multi-argument COUNT DISTINCT
  skips tuples containing a NULL (SQL standard, Spark semantics), so
  this difference counts BOTH duplicate keys AND null-containing keys
  — the same fail-closed stance as the row rules: a key the gate
  cannot verify as unique is a violation.

Scale shape (the 100 TB contract): ALL row rules ride ONE
``df.agg`` — partial-aggregable conditional sums, zero shuffles
beyond the final 1-row reduce; the per-rule rows come from an
explode-of-structs on that 1-row frame (the :mod:`.profile` pattern —
a union of per-rule scans would re-read the corpus k times).  Each
uniqueness rule adds one exact-distinct aggregate: Spark plans n
DISTINCT aggregates as an Expand (input ×(n_distinct_sets+1)) — fine
for the 1-2 key sets a contract typically pins, and documented here so
nobody ships a 20-uniqueness-rule contract by accident
(``approx=True`` swaps HLL ±1.6% for the duplicate count and keeps
the plan Expand-free at any rule count).

Reference parity: the reference validates per-message (decoder errors,
topic regex — both implemented in :mod:`.parse` / :mod:`.route`);
table-level contracts are part of the training-data governance
toolbox the task brief adds (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validation_report(
    df: DataFrame,
    row_rules: list[tuple[str, Column]] | None = None,
    unique_cols: list[list[str]] | None = None,
    approx: bool = False,
) -> DataFrame:
    """One row per rule: ``(rule, n_rows, n_violations, frac_violated,
    passed)``.

    ``rule`` names: row rules keep their given name; uniqueness rules
    are ``unique:<col>[,<col>…]``.  ``frac_violated`` rounded 6dp;
    ``passed`` = zero violations.  Raises on an empty rule set —
    a contract that checks nothing must not report success."""
    row_rules = row_rules or []
    unique_cols = unique_cols or []
    if not row_rules and not unique_cols:
        raise ValueError("validation_report requires at least one rule")
    aggs = [F.count("*").alias("_n")]
    names: list[str] = []
    for name, pred in row_rules:
        # fail-closed: NULL predicate counts as a violation
        aggs.append(
            F.sum(
                F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
            ).alias(f"_v{len(names)}")
        )
        names.append(name)
    for cols in unique_cols:
        if approx:
            # HLL over the whole-tuple struct (a null FIELD still forms
            # a countable struct, so null keys are not violations in
            # approx mode — ±1.6% dwarfs that distinction anyway).
            # Clamped at 0: an HLL OVERestimate on a clean column would
            # otherwise yield negative violations and fail the gate.
            dc = F.approx_count_distinct(F.struct(*cols))
            aggs.append(
                F.greatest(F.count(F.lit(1)) - dc, F.lit(0)).alias(
                    f"_v{len(names)}"
                )
            )
            names.append("unique:" + ",".join(cols))
            continue
        dc = F.count_distinct(*[F.col(c) for c in cols])
        aggs.append((F.count(F.lit(1)) - dc).alias(f"_v{len(names)}"))
        names.append("unique:" + ",".join(cols))
    one = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col(f"_v{i}").cast("long").alias("n_violations"),
        )
        for i, name in enumerate(names)
    ]
    return (
        one.select(F.col("_n"), F.explode(F.array(*entries)).alias("e"))
        .select(
            F.col("e.rule").alias("rule"),
            F.col("_n").alias("n_rows"),
            F.col("e.n_violations").alias("n_violations"),
            F.round(
                F.col("e.n_violations").cast("double")
                / F.greatest(F.col("_n"), F.lit(1)).cast("double"),
                6,
            ).alias("frac_violated"),
            (F.col("e.n_violations") == 0).alias("passed"),
        )
    )


def violating_rows(
    df: DataFrame, row_rules: list[tuple[str, Column]]
) -> DataFrame:
    """The quarantine frame: input rows that violate >= 1 row rule,
    with a ``violated`` array naming which (fail-closed NULL handling
    as in :func:`validation_report`).  Narrow map riding the scan —
    pair it with the report when the gate fails and the violating
    slice must be routed to a rejects table instead of dropped
    (the route.py "no message lost" philosophy, table-shaped)."""
    if not row_rules:
        raise ValueError("violating_rows requires at least one rule")
    flags = F.array(
        *[
            F.when(
                ~F.coalesce(pred, F.lit(False)), F.lit(name)
            ).otherwise(F.lit(None).cast("string"))
            for name, pred in row_rules
        ]
    )
    out = df.withColumn("violated", F.filter(flags, lambda x: x.isNotNull()))
    return out.filter(F.size("violated") > 0)


def fd_violations(
    df: DataFrame,
    lhs: list[str],
    rhs: str,
) -> DataFrame:
    """Functional-dependency audit ``lhs -> rhs``: the groups where the
    dependency FAILS (more than one distinct rhs value for one lhs
    tuple), with witness values for triage.

    The data-profiling complement to ``validation_report``'s
    uniqueness rule: uniqueness says "this key appears once"; an FD
    says "whenever the key repeats, this attribute must agree" — the
    invariant behind dimension conformance (order -> customer,
    uid -> conv), slowly-changing-attribute detection, and
    denormalization safety checks before a join is replaced by a
    stored column.

    Returns ``(lhs…, n_rhs_values, n_rows, rhs_min, rhs_max)`` for
    violating groups only (empty frame == dependency holds).

    Scale shape: the distinct count must be exact (a violation
    verdict cannot be probabilistic); with exactly one distinct-agg
    Spark plans the standard two-round expansion — an exchange on
    (lhs, rhs) that partially de-duplicates map-side, then the final
    exchange on lhs carrying the min/max witnesses — i.e. TWO
    compact-key shuffles and no grouping-sets row explosion.  NULL
    rhs is counted as a real level via a sentinel coalesce (an FD
    violated only by NULLs is still violated).
    """
    sent = "\x01<null>"
    r = F.coalesce(F.col(rhs).cast("string"), F.lit(sent))
    return (
        df.groupBy(*lhs)
        .agg(
            F.count_distinct(r).cast("bigint").alias("n_rhs_values"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min(r).alias("rhs_min"),
            F.max(r).alias("rhs_max"),
        )
        .filter(F.col("n_rhs_values") > 1)
    )
