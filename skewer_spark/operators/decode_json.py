"""JSON-family and W3C decoders (SURVEY.md §2.2) — pure expressions.

Each mirrors a reference decoder:

* ``parse_regular_json`` — the "Regular" JSON shape with facility /
  severity *names* and RFC3339 times
  (``/root/reference/decoders/json_format.go:13-20``,
  ``model/types.go:223-242``): names map back to codes via the reverse
  dictionaries with unknown → user/info defaults, ``priority`` is
  recomputed as ``fac*8+sev`` (``model/types.go:439-441``).
* ``parse_rsyslog_json`` — rsyslog's JSON export
  (``decoders/json_format.go:22-98``): ``pri`` may arrive as string,
  ``"-"`` sentinels mean empty, the ``$!`` bag lands in
  ``properties["rsyslog"]``.
* ``parse_gelf`` — Graylog GELF (``decoders/gelf.go:11-91``):
  ``level`` → severity, facility from the string field else 1 (user),
  ``_``-prefixed extras → ``properties["gelf"]``.
* ``parse_w3c`` — W3C extended log (``decoders/w3c.go:14-43``):
  parametrized field list, each line's space-separated values map into
  ``properties["w3c"]``.

All JVM-side (``from_json`` + map ops) — no Python in these paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from skewer_spark.schema import RFACILITIES, RSEVERITIES

REGULAR_SCHEMA = T.StructType([
    T.StructField("facility", T.StringType()),
    T.StructField("severity", T.StringType()),
    T.StructField("timereported", T.StringType()),
    T.StructField("timegenerated", T.StringType()),
    T.StructField("hostname", T.StringType()),
    T.StructField("appname", T.StringType()),
    T.StructField("procid", T.StringType()),
    T.StructField("msgid", T.StringType()),
    T.StructField("message", T.StringType()),
    T.StructField(
        "properties", T.MapType(T.StringType(), T.MapType(T.StringType(), T.StringType()))
    ),
])

RSYSLOG_SCHEMA = T.StructType([
    T.StructField("pri", T.StringType()),
    T.StructField("timereported", T.StringType()),
    T.StructField("timegenerated", T.StringType()),
    T.StructField("hostname", T.StringType()),
    T.StructField("app-name", T.StringType()),
    T.StructField("procid", T.StringType()),
    T.StructField("msgid", T.StringType()),
    T.StructField("msg", T.StringType()),
    T.StructField("$!", T.MapType(T.StringType(), T.StringType())),
])

GELF_SCHEMA = T.StructType([
    T.StructField("version", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("short_message", T.StringType()),
    T.StructField("full_message", T.StringType()),
    T.StructField("timestamp", T.DoubleType()),
    T.StructField("level", T.IntegerType()),
    T.StructField("facility", T.StringType()),
])


def _name_to_code(col: Column, mapping: dict[str, int], default: int) -> Column:
    """name → code via a literal-map lookup (single expression).

    A 24-branch ``when()`` chain here re-evaluates its input per branch
    (CaseWhen defeats codegen subexpression elimination — measured 72
    ``from_json`` evals/row in r01); ``try_element_at`` on a literal map
    evaluates the key exactly once and stays in codegen.
    """
    m = F.create_map(
        *[F.lit(x) for name, code in mapping.items() for x in (name, code)]
    )
    return F.coalesce(F.try_element_at(m, col), F.lit(default))


def _materialized(df: DataFrame, expr: Column) -> tuple[DataFrame, Column]:
    """Project ``expr`` into a temp column so downstream references share
    ONE evaluation.  CollapseProject keeps the projection separate
    because the expression is non-cheap and referenced many times —
    without this, every field reference re-runs ``from_json`` on the
    raw line (the r01 q_parse_json 25× slowdown)."""
    tmp = "_j"
    return df.withColumn(tmp, expr), F.col(tmp)


def parse_regular_json(df: DataFrame, text_col: str = "text") -> DataFrame:
    """RegularSyslog JSON → canonical parsed columns."""
    base, j = _materialized(df, F.from_json(F.col(text_col), REGULAR_SCHEMA))
    fac = _name_to_code(j["facility"], RFACILITIES, RFACILITIES["user"])
    sev = _name_to_code(j["severity"], RSEVERITIES, RSEVERITIES["info"])
    return base.select(
        *df.columns,
        (fac * 8 + sev).alias("priority"),
        fac.alias("facility"),
        sev.alias("severity"),
        F.lit(1).alias("version"),
        F.try_to_timestamp(j["timereported"]).alias("time_reported"),
        F.coalesce(j["hostname"], F.lit("")).alias("hostname"),
        F.coalesce(j["appname"], F.lit("")).alias("appname"),
        F.coalesce(j["procid"], F.lit("")).alias("procid"),
        F.coalesce(j["msgid"], F.lit("")).alias("msgid"),
        F.coalesce(j["message"], F.lit("")).alias("message"),
        F.to_json(j["properties"]).alias("properties_json"),
        j.isNotNull().alias("parse_ok"),
        F.lit("json").alias("parser_name"),
    )


def parse_rsyslog_json(df: DataFrame, text_col: str = "text") -> DataFrame:
    """rsyslog JSON → canonical parsed columns ('-' sentinel → empty)."""
    base, j = _materialized(df, F.from_json(F.col(text_col), RSYSLOG_SCHEMA))

    def dash(c: Column) -> Column:
        return F.when(c == "-", F.lit("")).otherwise(F.coalesce(c, F.lit("")))

    pri = j["pri"].try_cast("int")
    rbag = j["$!"]
    props = F.when(
        rbag.isNotNull(),
        F.to_json(F.create_map(F.lit("rsyslog"), rbag)),
    )
    return base.select(
        *df.columns,
        F.coalesce(pri, F.lit(0)).alias("priority"),
        F.coalesce((pri / 8).cast("int"), F.lit(0)).alias("facility"),
        F.coalesce(F.pmod(pri, F.lit(8)), F.lit(0)).alias("severity"),
        F.lit(1).alias("version"),
        F.try_to_timestamp(j["timereported"]).alias("time_reported"),
        dash(j["hostname"]).alias("hostname"),
        dash(j["app-name"]).alias("appname"),
        dash(j["procid"]).alias("procid"),
        dash(j["msgid"]).alias("msgid"),
        F.coalesce(j["msg"], F.lit("")).alias("message"),
        props.alias("properties_json"),
        j.isNotNull().alias("parse_ok"),
        F.lit("rsyslogjson").alias("parser_name"),
    )


def parse_gelf(df: DataFrame, text_col: str = "text") -> DataFrame:
    """GELF JSON → canonical parsed columns.

    level → severity; facility name → code, unknown/missing → 1 (user);
    timestamp is epoch seconds (float).
    """
    base, j = _materialized(df, F.from_json(F.col(text_col), GELF_SCHEMA))
    sev = F.coalesce(j["level"], F.lit(6))
    fac = _name_to_code(j["facility"], RFACILITIES, 1)
    return base.select(
        *df.columns,
        (fac * 8 + sev).alias("priority"),
        fac.alias("facility"),
        sev.alias("severity"),
        F.lit(1).alias("version"),
        # plausibility-gated: ANSI-mode to_timestamp(double) throws
        # CAST_OVERFLOW on one absurd value (e.g. 1e30) and aborts the
        # job; the bound is the datetime64[ns] range (1677–2262), which
        # also keeps the value Arrow/pandas-representable downstream
        F.timestamp_seconds(
            F.when(
                j["timestamp"].between(-9.2e9, 9.2e9), j["timestamp"]
            )
        ).alias("time_reported"),
        F.coalesce(j["host"], F.lit("")).alias("hostname"),
        F.lit("").alias("appname"),
        F.lit("").alias("procid"),
        F.lit("").alias("msgid"),
        F.coalesce(j["short_message"], F.lit("")).alias("message"),
        F.lit(None).cast("string").alias("properties_json"),
        j.isNotNull().alias("parse_ok"),
        F.lit("gelf").alias("parser_name"),
    )


# hard bound on LTSV labels per line: the keep-last dedup is O(k²), so
# k must be capped before it (256² = 65k comparisons worst case — noise;
# an uncapped adversarial line would be ~10^11)
_LTSV_MAX_LABELS = 256


def parse_ltsv(df: DataFrame, text_col: str = "text") -> DataFrame:
    """LTSV (Labeled Tab-Separated Values, ltsv.org) → canonical columns.

    The reference registers an LTSV decoder whose implementation is a
    nil stub (``/root/reference/decoders/ltsv.go:5``); this goes beyond
    parity and implements the public format: TAB-separated
    ``label:value`` pairs, value = everything after the FIRST colon.
    Conventional labels map onto the canonical frame (``time`` →
    time_reported, ``host`` → hostname, ``ident`` → appname, ``pid`` →
    procid, ``msg``/``message`` → message, optional ``pri`` → syslog
    priority arithmetic); ALL pairs land in ``properties["ltsv"]``,
    key-sorted so the JSON is injection-order independent.  Pure JVM
    expressions — no Python in the row path.

    The map is built from an explicitly keep-LAST-deduplicated entry
    array rather than ``str_to_map``: under Spark's default
    ``spark.sql.mapKeyDedupPolicy=EXCEPTION`` a single log line with a
    repeated label would abort the whole job (found by the LTSV fuzz)
    — a per-line data problem must never be a job-level failure at
    10^12 rows, and this stays robust regardless of session config.
    The O(k²) later-duplicate probe runs over a line's ~10 labels and
    is hard-bounded at ``_LTSV_MAX_LABELS`` entries: an adversarial
    line with 500k single-char tokens would otherwise cost ~10^11
    comparisons inside ONE row's expression — not a crash, but a
    straggler that stalls its task (ADVICE r02).  Over-long lines keep
    their first ``_LTSV_MAX_LABELS`` pairs and are flagged
    ``parse_ok=false`` (honest truncation, never silent).
    """
    raw_parts = F.split(F.col(text_col), "\t")
    entries = F.transform(
        F.slice(raw_parts, 1, _LTSV_MAX_LABELS),
        lambda p: F.struct(
            F.substring_index(p, ":", 1).alias("key"),
            # value = everything after the FIRST colon; no colon → null
            F.when(
                p.contains(":"), F.regexp_replace(p, "^[^:]*:", "")
            ).alias("value"),
        ),
    )
    # bind the entry array to a lambda variable and materialize the
    # FINAL map: without this every downstream reference (pri / ok /
    # both property maps) re-embeds the O(k²) dedup filter — the same
    # re-evaluation trap _materialized documents for from_json (a plan
    # audit counted 16 copies before this binding)
    kept = F.transform(
        F.array(entries),
        lambda ent: F.filter(
            ent,
            lambda e, i: ~F.exists(
                F.slice(ent, i + 2, F.greatest(F.size(ent), F.lit(1))),
                lambda e2: e2["key"] == e["key"],
            ),
        ),
    )[0]
    base, m = _materialized(df, F.map_from_entries(kept))
    sorted_m = F.map_from_entries(
        F.array_sort(F.map_entries(m), _by_entry_key)
    )
    pri = F.try_element_at(m, F.lit("pri")).try_cast("int")
    ok = (
        m.isNotNull()
        & (F.size(m) > 0)
        # a token with no colon parses as {token -> null}: malformed
        & ~F.exists(F.map_values(m), lambda v: v.isNull())
        # pathological label counts were truncated above — flag them
        & (F.size(F.split(F.col(text_col), "\t")) <= _LTSV_MAX_LABELS)
    )
    return base.select(
        *df.columns,
        F.coalesce(pri, F.lit(0)).alias("priority"),
        F.coalesce((pri / 8).cast("int"), F.lit(0)).alias("facility"),
        F.coalesce(F.pmod(pri, F.lit(8)), F.lit(0)).alias("severity"),
        F.lit(1).alias("version"),
        F.try_to_timestamp(F.try_element_at(m, F.lit("time"))).alias("time_reported"),
        F.coalesce(F.try_element_at(m, F.lit("host")), F.lit("")).alias("hostname"),
        F.coalesce(F.try_element_at(m, F.lit("ident")), F.lit("")).alias("appname"),
        F.coalesce(F.try_element_at(m, F.lit("pid")), F.lit("")).alias("procid"),
        F.lit("").alias("msgid"),
        F.coalesce(
            F.try_element_at(m, F.lit("msg")),
            F.try_element_at(m, F.lit("message")),
            F.lit(""),
        ).alias("message"),
        F.when(
            ok, F.to_json(F.create_map(F.lit("ltsv"), sorted_m))
        ).alias("properties_json"),
        ok.alias("parse_ok"),
        F.lit("ltsv").alias("parser_name"),
    )


def _by_entry_key(a, b):
    return (
        F.when(a.key < b.key, F.lit(-1))
        .when(a.key > b.key, F.lit(1))
        .otherwise(F.lit(0))
    )


def parse_w3c(df: DataFrame, fields: list[str], text_col: str = "text") -> DataFrame:
    """W3C extended log: each line's values → properties['w3c'][field].

    The field list comes from the `#Fields:` directive (configured, as
    in the reference where the decoder is parametrized per source).
    """
    base, vals = _materialized(df, F.split(F.col(text_col), " "))
    kv = F.map_from_arrays(
        F.array(*[F.lit(f) for f in fields]),
        F.slice(vals, 1, len(fields)),
    )
    return base.select(
        *df.columns,
        F.lit(0).alias("priority"),
        F.lit(0).alias("facility"),
        F.lit(0).alias("severity"),
        F.lit(0).alias("version"),
        F.lit(None).cast("timestamp").alias("time_reported"),
        F.lit("").alias("hostname"),
        F.lit("").alias("appname"),
        F.lit("").alias("procid"),
        F.lit("").alias("msgid"),
        F.lit("").alias("message"),
        F.to_json(F.create_map(F.lit("w3c"), kv)).alias("properties_json"),
        (F.size(vals) >= len(fields)).alias("parse_ok"),
        F.lit("w3c").alias("parser_name"),
    )
