"""Re-identification risk audit: k-anonymity and l-diversity.

:mod:`skewer_spark.functions.scrub` removes DIRECT identifiers (emails,
IPs, phone numbers).  What it cannot see is QUASI-identifier risk: the
combination of innocuous columns (zip × birth-year × role, or for
transcripts: tool × hour × user-bucket) that is unique enough to point
back at one person even with every direct identifier gone.  The
standard audits (Sweeney 2002; Machanavajjhala et al., ICDE'06):

* **k-anonymity** — every row must share its quasi-identifier (QI)
  combination with at least ``k-1`` other rows;
* **l-diversity** — within each QI group, the SENSITIVE attribute must
  take at least ``l`` distinct values (a k-anonymous group where all
  members share one diagnosis still leaks it).

``qi_group_audit`` computes both per QI group; ``risk_summary``
collapses the group frame to one audit row (rows/groups at risk).

Scale shape (the 100 TB contract): the corpus shuffles as compact key
columns only — payload/text never rides the exchange.  With a
sensitive column the plan is the canonical exact-distinct pair of
PARTIAL-AGGREGABLE exchanges (dedup on ``(QI, sensitive)``, then
``groupBy(QI)``; both combine map-side); without one it is a single
``groupBy(QI)``.  The returned group frame is |distinct QI combos|
rows, and ``risk_summary`` aggregates THAT (never re-touches the
corpus).  Exact ``count_distinct`` is safe here because the sensitive
attribute is low-cardinality by definition; the grouping-sets caveat
from ``aggregate.py`` (exact distinct expands input ×n_sets) does not
apply — there is a single grouping set.

Reference parity: no analog in the reference (a syslog router); part
of the training-data governance toolbox the task brief adds
(SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def qi_group_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
    k: int = 5,
    l: int = 2,  # noqa: E741 - the literature's name
) -> DataFrame:
    """Per-QI-group audit frame.

    Returns one row per distinct quasi-identifier combination:
    ``(*quasi_cols, group_size, n_sensitive, k_anonymous, l_diverse)``.
    ``n_sensitive`` / ``l_diverse`` are NULL when no ``sensitive_col``
    is given (pure k-anonymity audit).  NULL QI values form their own
    group (SQL grouping semantics) — a NULL zip code is itself a
    quasi-identifier value.
    """
    aggs = [F.count("*").alias("group_size")]
    if sensitive_col is not None:
        aggs.append(F.count_distinct(F.col(sensitive_col)).alias("n_sensitive"))
    out = df.groupBy(*quasi_cols).agg(*aggs)
    out = out.withColumn("k_anonymous", F.col("group_size") >= F.lit(k))
    if sensitive_col is not None:
        out = out.withColumn("l_diverse", F.col("n_sensitive") >= F.lit(l))
    else:
        out = out.withColumn(
            "n_sensitive", F.lit(None).cast("long")
        ).withColumn("l_diverse", F.lit(None).cast("boolean"))
        out = out.select(
            *quasi_cols, "group_size", "n_sensitive", "k_anonymous", "l_diverse"
        )
    return out


def risk_summary(group_audit: DataFrame) -> DataFrame:
    """One-row release-gate summary over a ``qi_group_audit`` frame:
    ``(n_rows, n_groups, min_group_size, rows_at_risk, groups_at_risk,
    rows_not_diverse)`` — ``rows_at_risk`` counts the rows living in
    sub-k groups (each is re-identifiable by its QI combination);
    ``rows_not_diverse`` the rows in k-anonymous-but-homogeneous groups
    (attribute disclosure).  Aggregates the compact group frame only.
    """
    risk = F.when(~F.col("k_anonymous"), F.col("group_size")).otherwise(F.lit(0))
    hom = F.when(
        F.col("k_anonymous") & ~F.coalesce(F.col("l_diverse"), F.lit(True)),
        F.col("group_size"),
    ).otherwise(F.lit(0))
    return group_audit.agg(
        F.sum("group_size").alias("n_rows"),
        F.count("*").alias("n_groups"),
        F.min("group_size").alias("min_group_size"),
        F.sum(risk).alias("rows_at_risk"),
        F.sum(F.when(~F.col("k_anonymous"), 1).otherwise(0)).alias(
            "groups_at_risk"
        ),
        F.sum(hom).alias("rows_not_diverse"),
    )


def dp_counts(
    df: DataFrame,
    keys: list[str],
    epsilon: float = 1.0,
    salt: str = "dp-v1",
) -> DataFrame:
    """ε-DP count release via deterministic Laplace noise.

    The classic Laplace mechanism for counting queries (sensitivity 1):
    released count = exact count + Lap(1/ε).  The noise draw is a pure
    function of ``(salt, key)`` through the repo's md5-uniform
    primitive (:func:`skewer_spark.functions.draws.md5_uniform`) pushed
    through the Laplace inverse CDF — so reruns, retries, and the
    DuckDB oracle all release the SAME number (SURVEY §4.3 determinism
    contract), while across salts the draws behave as fresh Laplace
    noise.  Rotating the salt consumes privacy budget exactly like a
    fresh mechanism invocation would — ε composes additively per
    release, which is equally true of any rerun-stable DP system.

    Returns ``(keys…, n_noisy)``; the exact count deliberately does
    NOT ride along (releasing it next to the noisy one would defeat
    the mechanism; callers who need it for tests recompute it).

    SECURITY CAVEAT (key domain): noisy counts are released only for
    groups PRESENT in the data, so the released key set itself leaks
    presence — a group differing by one row flips between absent and
    present in the release, which no amount of count noise hides.
    Strict ε-DP therefore holds only when callers release over a
    FIXED, PUBLIC key domain: join the output against the public
    domain (or pass a frame pre-extended with it) so absent groups get
    noisy zeros instead of silence.  Over data-dependent key sets the
    guarantee degrades to ε-DP on the counts conditioned on the
    released keys.

    SECURITY CAVEAT (salt): determinism moves the secret from an RNG
    state to the salt.  The ε-DP guarantee holds only against consumers who do
    NOT know the salt — anyone holding it can recompute and subtract
    the noise.  Treat the salt like a key: unique per release, stored
    with the pipeline's secrets, never published next to the release
    (the driver fixture publishes its salt because its releases guard
    nothing — it is exercising the mechanism, not the privacy).

    Scale shape: one partial-aggregable groupBy on the release keys;
    the noise is a scalar expression over the already-reduced
    per-group frame — zero extra shuffles, no RNG state, no Python.
    """
    from skewer_spark.functions.draws import md5_uniform

    if epsilon <= 0:
        raise ValueError(f"epsilon must be positive, got {epsilon}")
    # unit-separator joint key: without it ("ab","c") and ("a","bc")
    # would draw the SAME noise, correlating two groups' releases.
    # NULL keys get a sentinel BEFORE the join — concat_ws silently
    # drops NULL arguments (separator included), so (NULL,'a') and
    # ('a',NULL) would otherwise both key as 'a'
    key_str = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(k).cast("string"), F.lit("\x01<null>"))
            for k in keys
        ],
    )
    u = md5_uniform(F.concat(F.lit(salt + "|"), key_str))
    # Laplace inverse CDF around 0: x = -b * sign(u-1/2) * ln(1-2|u-1/2|)
    centered = u - F.lit(0.5)
    mag = F.greatest(F.lit(1.0) - F.lit(2.0) * F.abs(centered), F.lit(1e-12))
    noise = -F.lit(1.0 / float(epsilon)) * F.signum(centered) * F.log(mag)
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            *keys,
            F.round(F.col("_n") + noise, 3).alias("n_noisy"),
        )
    )
