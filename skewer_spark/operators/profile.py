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


def numeric_histogram(
    df: DataFrame,
    value_col: str,
    bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram of a numeric column: one row per non-empty
    bin — ``(bin, bin_lo, bin_hi, n, frac)``.

    Bounds default to the column's min/max (ONE tiny aggregate
    collected to the driver — the same driver-literal pattern as
    ``sq8_scale``; pass explicit bounds to skip that scan when the
    domain is known).  Values land in ``floor((v - lo)/width)`` clamped
    to the last bin, so ``v == hi`` is counted, and out-of-range values
    clamp to the edge bins rather than vanish (a histogram that drops
    data lies about the distribution).  NULLs are excluded and
    reported via :func:`profile_table`, not here.

    Scale shape: bounds = one partial-aggregable min/max; binning is a
    narrow map; counts are ONE partial-aggregable ``groupBy(bin)`` on
    an integer key — two scans total with derived bounds, one with
    explicit bounds."""
    v = F.col(value_col).cast("double")
    if lo is None or hi is None:
        row = df.agg(
            F.min(v).alias("lo"), F.max(v).alias("hi")
        ).collect()[0]
        if row["lo"] is None or row["hi"] is None:
            raise ValueError(
                f"numeric_histogram: no non-null values in {value_col}"
            )
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    if not hi > lo:
        raise ValueError(f"degenerate histogram range [{lo}, {hi}]")
    width = (hi - lo) / float(bins)
    b = F.least(
        F.greatest(
            F.floor((v - F.lit(lo)) / F.lit(width)).cast("long"), F.lit(0)
        ),
        F.lit(bins - 1),
    )
    counts = (
        df.filter(v.isNotNull())
        .select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
    )
    total = counts.agg(F.sum("n").alias("_t"))
    return counts.crossJoin(F.broadcast(total)).select(
        F.col("bin").cast("int").alias("bin"),
        F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("bin_lo"),
        F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6).alias(
            "bin_hi"
        ),
        "n",
        F.round(F.col("n").cast("double") / F.col("_t").cast("double"), 6)
        .alias("frac"),
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    out_col: str = "value_w",
) -> DataFrame:
    """Percentile clipping (winsorization): values below the ``p_lo``
    quantile or above the ``p_hi`` quantile are clamped to it, with an
    ``is_clipped`` flag — the outlier guard applied to reward/score
    columns before they become training weights.

    Exact ``F.percentile`` thresholds (matches DuckDB quantile_cont
    bit-for-bit — the q_token_pctl-proven pairing), joined back as a
    broadcast 1-row frame so the corpus never reshuffles;
    ``approx_percentile`` is the documented 100 TB swap (exact global
    percentile buffers per-partition value lists).  Clipped values
    rounded 6dp."""
    v = F.col(value_col).cast("double")
    th = df.agg(
        F.percentile(v, F.lit(p_lo)).alias("_lo"),
        F.percentile(v, F.lit(p_hi)).alias("_hi"),
    )
    out = df.crossJoin(F.broadcast(th))
    clipped = F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    return out.select(
        *df.columns,
        F.round(clipped, 6).alias(out_col),
        ((v < F.col("_lo")) | (v > F.col("_hi"))).alias("is_clipped"),
    )


def category_entropy(
    df: DataFrame,
    key_cols: list[str],
    cat_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Per-key Shannon entropy of a categorical column — the source
    diversity signal mixture curation keys on (a domain whose docs all
    come from one crawl source scores 0; uniform across k sources
    scores ln k), and the per-conversation tool-diversity metric on
    the transcript table.

    Two partial-aggregable groupBys on compact keys:
    ``(key, cat) → c`` then ``key → Σ``, with the algebraic identity

        H = ln(n) − (Σ c·ln c) / n

    so only integer counts cross the shuffle and the log form needs no
    per-category probability column.  ``norm_entropy`` divides by
    ``ln(n_cats)`` (NULL for a single category — 0/0), giving the
    scale-free [0,1] evenness score.

    NULL categories count as a real level (explicitly coalesced to a
    sentinel) — a column going silently null IS a diversity collapse,
    which is exactly what this metric exists to flag.
    """
    cat = F.coalesce(F.col(cat_col).cast("string"), F.lit("\x00null"))
    counts = (
        df.select(*[F.col(c) for c in key_cols], cat.alias("_cat"))
        .groupBy(*key_cols, "_cat")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    c = F.col("_c").cast("double")
    agg = counts.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.sum("_c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_cats"),
        F.sum(c * F.log(c)).alias("_clogc"),
    )
    n = F.col("n_rows").cast("double")
    h = F.log(n) - F.col("_clogc") / n
    return agg.select(
        *key_cols,
        "n_rows",
        "n_cats",
        F.round(h, round_dp).alias("entropy"),
        F.round(
            F.when(
                F.col("n_cats") > 1,
                h / F.log(F.col("n_cats").cast("double")),
            ),
            round_dp,
        ).alias("norm_entropy"),
    )
