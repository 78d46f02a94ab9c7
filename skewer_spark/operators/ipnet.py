"""IP/CIDR network enrichment: longest-prefix-match lookup joins.

The reference resolves client network facts per connection on the
socket path (``/root/reference/services/network/tcp.go`` stamps
``client``/port properties straight off the accepted conn); a batch
log pipeline instead carries the client address as a column and joins
it against a CIDR table (geo/ASN/threat feeds, internal network
inventories).  The lookup is *longest-prefix-match*: a /24 entry must
beat the /8 that also contains the address.

Scale design — why this is not a BroadcastNestedLoopJoin:

A naive ``ip BETWEEN net_start AND net_end`` join has no equi-key, so
Spark plans a nested-loop join: O(rows × cidrs) comparisons even when
the dim is broadcast — 10^12 turns × 10^5 feed entries is 10^17
predicate evaluations.  Instead :func:`expand_cidrs` rewrites the dim
at a fixed coarse granularity (default /16): every CIDR is exploded to
the /16 blocks it covers (a /8 contributes 256 rows; a /24 contributes
1), and the probe side computes its /16 bucket with two shifts.  The
join becomes an **equi broadcast hash join** on the bucket plus a
residual range filter — one codegen'd stage, zero shuffles, and the
expanded dim stays small (feeds are prefix-heavy; even a full /0
default route is only 65,536 rows).  Longest-prefix-wins is a
``max_by`` over the ≤ handful of matching prefixes per row, grouped on
the probe's own key — and because the bucket join is row-preserving on
the probe side (each probe row matches each candidate once), that
group-by collapses map-side.

IPv4 only (the fixture synthesises v4); v6 would use the same shape
with two 64-bit halves and a /32 coarse bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

COARSE_BITS = 16


def ip_to_long(col: F.Column) -> F.Column:
    """Dotted-quad string → uint32 as BIGINT (pure expressions)."""
    parts = F.split(col, r"\.")
    return (
        parts[0].cast("bigint") * F.lit(16777216)
        + parts[1].cast("bigint") * F.lit(65536)
        + parts[2].cast("bigint") * F.lit(256)
        + parts[3].cast("bigint")
    )


def cidr_bounds(cidr_col: str) -> tuple[F.Column, F.Column, F.Column]:
    """CIDR string column ``a.b.c.d/n`` → (net_start, net_end,
    prefix_len) expressions.

    ``net_start`` is masked (a sloppy feed row like ``10.1.1.7/16``
    normalises to ``10.1.0.0/16``), so membership is a plain range
    check downstream.
    """
    base = ip_to_long(F.split(F.col(cidr_col), "/")[0])
    plen = F.split(F.col(cidr_col), "/")[1].cast("int")
    # 2^(32-plen) via shiftleft on BIGINT — no float pow drift.
    # (pyspark's shiftleft only takes a literal bit count, so spell it
    # as a SQL expression over the inlined prefix length)
    block = F.expr(
        "shiftleft(CAST(1 AS BIGINT), "
        "32 - CAST(split({c}, '/')[1] AS INT))".format(c=cidr_col)
    )
    start = base - base % block
    return start, start + block - F.lit(1), plen


def expand_cidrs(
    cidrs: DataFrame, cidr_col: str = "cidr", coarse_bits: int = COARSE_BITS
) -> DataFrame:
    """Explode each CIDR to the coarse blocks it covers.

    Output columns: ``bucket`` (the /coarse_bits block index),
    ``net_start``, ``net_end``, ``prefix_len`` + every other dim
    column.  Prefixes *longer* than ``coarse_bits`` land in exactly one
    bucket; shorter ones fan out to ``2^(coarse_bits - prefix_len)``
    rows.  The explode is ``sequence()`` over bucket indices — pure
    expressions, no Python.
    """
    start, end, plen = cidr_bounds(cidr_col)
    shift = 32 - coarse_bits
    with_bounds = cidrs.withColumns(
        {
            "net_start": start,
            "net_end": end,
            "prefix_len": plen,
        }
    )
    return with_bounds.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.shiftright(F.col("net_start"), shift),
                F.shiftright(F.col("net_end"), shift),
            )
        ),
    )


def cidr_enrich(
    df: DataFrame,
    cidrs: DataFrame,
    ip_col: str = "ip",
    cidr_col: str = "cidr",
    attr_cols: list[str] | None = None,
    coarse_bits: int = COARSE_BITS,
) -> DataFrame:
    """Longest-prefix-match enrich: one broadcast equi-join, no shuffle
    of the fact side.

    Adds ``matched_cidr``, ``prefix_len`` and ``attr_cols`` from the
    winning (longest-prefix, then lexicographically-first CIDR on
    ties) entry; unmatched rows keep NULLs, like the reference's
    unknown-facility default path (``model/types.go:182-208``) keeps a
    sentinel rather than dropping the message.

    The ties-and-winner step is ``min_by(struct, (-prefix_len,
    cidr))`` grouped by the probe row's own identity — aggregation,
    not a window, so partial (map-side) aggregation applies and the
    probe table never shuffles wider than its own key.  Probe rows
    must be distinct (carry a unique key column, as any UID-stamped
    log frame does) — exact duplicates would collapse in that
    group-by.
    """
    if attr_cols is None:
        attr_cols = [
            c
            for c in cidrs.columns
            if c not in {cidr_col, "bucket", "net_start", "net_end", "prefix_len"}
        ]
    shift = 32 - coarse_bits
    expanded = expand_cidrs(cidrs, cidr_col, coarse_bits)

    probe = df.withColumn("_ip_long", ip_to_long(F.col(ip_col)))
    probe = probe.withColumn("_bucket", F.shiftright(F.col("_ip_long"), shift))

    dim = F.broadcast(
        expanded.select(
            F.col("bucket").alias("_bucket"),
            F.col("net_start"),
            F.col("net_end"),
            F.col("prefix_len"),
            F.col(cidr_col).alias("matched_cidr"),
            *[F.col(c) for c in attr_cols],
        )
    )
    joined = probe.join(
        dim,
        on=(probe["_bucket"] == dim["_bucket"])
        & (F.col("_ip_long") >= F.col("net_start"))
        & (F.col("_ip_long") <= F.col("net_end")),
        how="left",
    )
    # winner per probe row: longest prefix, then smallest CIDR string
    # as deterministic tie-break (two equal-length prefixes can only
    # both match if the feed holds duplicate networks).  min_by over
    # struct(-prefix_len, cidr) keeps the attrs together so one agg
    # resolves everything.
    payload = F.struct(
        F.col("prefix_len").alias("prefix_len"),
        F.col("matched_cidr").alias("matched_cidr"),
        *[F.col(c).alias(c) for c in attr_cols],
    )
    rank = F.struct(
        (-F.coalesce(F.col("prefix_len"), F.lit(-1))).alias("np"),
        F.coalesce(F.col("matched_cidr"), F.lit("")).alias("c"),
    )
    keep = [c for c in df.columns]
    won = (
        joined.groupBy(*keep)
        .agg(F.min_by(payload, rank).alias("_win"))
        .select(
            *keep,
            F.col("_win.matched_cidr").alias("matched_cidr"),
            F.col("_win.prefix_len").alias("prefix_len"),
            *[F.col(f"_win.{c}").alias(c) for c in attr_cols],
        )
    )
    return won


def demo_cidr_table(spark) -> DataFrame:
    """A deterministic overlapping CIDR feed for tests/queries: nested
    prefixes (/8 ⊃ /12 ⊃ /16 ⊃ /24) so longest-prefix-wins is actually
    exercised, plus gaps so the unmatched path is too.
    """
    rows = [
        ("10.0.0.0/8", "corp", "rfc1918"),
        ("10.32.0.0/12", "corp-west", "rfc1918"),
        ("10.32.0.0/16", "corp-west-dc1", "rfc1918"),
        ("10.32.7.0/24", "corp-west-dc1-mgmt", "rfc1918"),
        ("172.16.0.0/12", "corp-legacy", "rfc1918"),
        ("192.168.0.0/16", "lab", "rfc1918"),
        ("192.168.144.0/20", "lab-gpu", "rfc1918"),
        ("100.64.0.0/10", "cgnat", "shared"),
        ("198.51.100.0/24", "testnet2", "doc"),
        ("203.0.113.0/24", "testnet3", "doc"),
    ]
    schema = StructType(
        [
            StructField("cidr", StringType()),
            StructField("net_name", StringType()),
            StructField("net_class", StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)
