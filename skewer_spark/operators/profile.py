"""One-pass table profiling — per-column nulls / distincts / extrema.

Every ingestion pipeline fronts its sources with a profile step (the
reference counts per-source messages and parse errors in
``metrics.go``; a tabular engine owes the same visibility per COLUMN):
row count, null count, distinct count, min/max.  This operator computes
the whole profile in ONE scan and returns it long-form — one row per
column — so downstream checks (null-rate regressions, domain drift)
diff two profile frames instead of re-scanning data.

Scale shape:

* all per-column aggregates ride a single ``df.agg(...)`` — one pass,
  partial-aggregable, no shuffle beyond the 1-row final combine;
* ``exact_distinct=False`` (default) uses ``approx_count_distinct``
  (HLL, partial-aggregable).  ``True`` switches to exact
  ``count_distinct`` — Spark expands the input k-fold for k
  multi-distinct aggregates (the CLAUDE.md grouping-sets trap), so
  exact is for modest tables / oracle parity, approx is the 100 TB
  path;
* extrema are cast to strings per dtype so the profile frame has ONE
  schema regardless of the input's: integrals/strings/booleans cast
  verbatim, timestamps format as ``yyyy-MM-dd HH:mm:ss.SSSSSS``,
  floats format with 6 dp (cross-engine float printing is not
  byte-stable; 6 dp printf is).

The unpivot runs on the 1-row aggregate frame (k projections of one
row — no Spark ``stack`` needed, nothing measurable at any scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_str(c: Column, dtype: str) -> Column:
    if dtype.startswith("timestamp"):
        return F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    if dtype in ("float", "double"):
        return F.format_string("%.6f", c)
    return c.cast("string")


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """``(column, dtype, n_rows, n_nulls, n_distinct, min_value,
    max_value)`` — one row per profiled column, one scan total."""
    dtypes = dict(df.dtypes)
    names = cols if cols is not None else list(df.columns)
    unsupported = [c for c in names if c not in dtypes]
    if unsupported:
        raise ValueError(f"unknown columns: {unsupported}")

    distinct_of = F.count_distinct if exact_distinct else (
        lambda c: F.approx_count_distinct(c)
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in names:
        col = F.col(c)
        # aggregate NATIVELY, stringify after: lexicographic min/max on
        # stringified numerics would say max(100, 99) == 99
        aggs += [
            F.count(col).alias(f"__nn_{c}"),
            distinct_of(col).alias(f"__nd_{c}"),
            _to_str(F.min(col), dtypes[c]).alias(f"__min_{c}"),
            _to_str(F.max(col), dtypes[c]).alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)

    # unpivot the 1-row frame INSIDE one plan: explode an array of
    # per-column structs.  (A union of k projections re-executes the
    # aggregate per branch — k scans of the source; pinned by test.)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dtypes[c]).alias("dtype"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in names
        ]
    )
    return one.select(
        F.col("__n").alias("n_rows"), F.explode(entries).alias("e")
    ).select(
        "e.column", "e.dtype", "n_rows", "e.n_nulls", "e.n_distinct",
        "e.min_value", "e.max_value",
    )
