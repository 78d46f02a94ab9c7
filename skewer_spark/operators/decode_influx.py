"""InfluxDB line-protocol decoder (SURVEY.md §2.2) — vectorized.

Semantics from ``/root/reference/decoders/influxdb.go:13-95``:
``measurement[,tag=v...] field=v[,field=v...] [ts]`` →
appname="influxdb", facility=16 (local0), severity=6 (info), version 1,
message = measurement, tags → properties["influxdb_tags"] (tag ``host``
also fills hostname), fields → properties["influxdb_fields"] with a
type-suffixed key (``_integer`` / ``_float`` / ``_boolean`` /
``_string``).  ``ProcId`` carries a deterministic per-line hash
(documented deviation — the reference's HashID is a series-key FNV
hash; here it's pandas' stable 64-bit line hash, vectorized).

Fully pandas-vectorized: the line is split with escape-aware regexes,
tag/field pairs are exploded into ONE pairs table whose classification
and typing run as column-wise ``.str`` ops, and the JSON properties
string is assembled with a sorted segment-join — no per-row Python in
the hot path (the only ``.map`` is Go-style float canonicalization over
float-typed field values).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from skewer_spark.schema import PARSED_STRUCT

# split on unescaped comma / space
_RE_UNESC_SPACE = re.compile(r"(?<!\\) ")
_RE_UNESC_COMMA = re.compile(r"(?<!\\),")
_RE_INT = re.compile(r"^-?\d+i$")
_RE_FLOAT = re.compile(r"^-?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$")
_RE_TS = re.compile(r"^-?\d+$")
_BOOL_TRUE = ("t", "T", "true", "True", "TRUE")
_BOOL_FALSE = ("f", "F", "false", "False", "FALSE")


def _go_float(x: float) -> str:
    """Go strconv.FormatFloat(f, 'g'-ish, -1) canonical form.

    Trailing zeros are stripped from the MANTISSA only — a naive
    rstrip over the whole repr eats exponent digits ('1.5e+20' →
    '1.5e+2', 18 orders of magnitude off; caught by review)."""
    r = repr(x)
    if "e" in r:
        m, e = r.split("e")
        if "." in m:
            m = m.rstrip("0").rstrip(".")
        return m + "e" + e
    return r.rstrip("0").rstrip(".") if "." in r else r


def _json_escape(s: pd.Series) -> pd.Series:
    # fast path: metric keys/values almost never contain specials —
    # escape only the rows that need it (per-element .str.replace over
    # the whole series was ~13% of batch time)
    need = s.str.contains("\\", regex=False, na=False) | s.str.contains(
        '"', regex=False, na=False
    )
    if not need.any():
        out = s
    else:
        esc = (
            s[need]
            .str.replace("\\", "\\\\", regex=False)
            .str.replace('"', '\\"', regex=False)
        )
        out = s.copy()
        out[need] = esc
    # control chars are rare: escape them JSON-style only when present
    if out.str.contains(r"[\x00-\x1f]", regex=True, na=False).any():
        out = out.str.replace(
            r"[\x00-\x1f]", lambda m: "\\u%04x" % ord(m.group()), regex=True
        )
    return out


def _segment_join(rows: pd.Series, keys: pd.Series, js: pd.Series) -> pd.Series:
    """Per-row ``,``-join of ``js`` fragments sorted by key (the
    json.dumps(sort_keys=True) order), duplicate keys keep the LAST
    occurrence like dict insertion did in the reference.

    Group-concat WITHOUT ``groupby().agg(str.join)`` (a per-group
    Python aggregation — was half the batch time): sort once, then one
    global ``str.join`` with a ``\\x01`` sentinel between groups and a
    single split.  Control chars cannot appear in fragments —
    ``_json_escape`` turns them into ``\\u00XX`` — and ``\\x01``
    (unlike NUL) survives numpy's fixed-width unicode dtype, which
    treats NUL as padding and silently strips it."""
    d = pd.DataFrame({"r": rows.to_numpy(), "k": keys.to_numpy(),
                      "j": js.to_numpy()})
    d = d.drop_duplicates(subset=["r", "k"], keep="last")
    d = d.sort_values(["r", "k"], kind="stable")
    r = d["r"].to_numpy()
    if len(r) == 0:
        return pd.Series([], dtype=object)
    first = np.empty(len(r), dtype=bool)
    first[0] = True
    first[1:] = r[1:] != r[:-1]
    pref = np.where(first, "\x01", ",")
    big = "".join([p + s for p, s in zip(pref, d["j"].to_numpy())])
    return pd.Series(big.split("\x01")[1:], index=r[first])


def _split_unescaped(s: pd.Series, sep: str, rx: re.Pattern, n: int = -1) -> pd.Series:
    """Split on unescaped ``sep``: plain C-level ``str.split`` for rows
    without any backslash (the overwhelming majority of metric lines),
    the lookbehind regex only for the rows that contain one."""
    has_bs = s.str.contains("\\", regex=False, na=False)
    if not has_bs.any():
        return s.str.split(sep, n=n)
    plain = s[~has_bs].str.split(sep, n=n)
    esc = s[has_bs].str.split(rx, n=n, regex=True)
    return pd.concat([plain, esc]).reindex(s.index)


def parse_influx_batch(text: pd.Series) -> pd.DataFrame:
    s = text.fillna("").astype(object).str.strip()
    idx = s.index

    toks = _split_unescaped(s, " ", _RE_UNESC_SPACE, n=2)
    # astype(object): a batch where every line lacks the 3rd (or 2nd)
    # token yields an all-NaN float64 column, on which .str raises
    meas_tags = toks.str[0].astype(object)
    fields_str = toks.str[1].astype(object)
    ts_str = toks.str[2].astype(object)

    # ---- timestamp (3rd token must be all digits when present) ----
    no_ts = ts_str.isna() | (ts_str == "")
    ts_digits = ts_str.str.match(_RE_TS, na=False)
    bad_ts = ~no_ts & ~ts_digits
    # EXACT int64 ns: to_numeric over a batch with any absent ts yields
    # float64, which silently rounds ns values above 2^53 (caught by
    # the fuzz vs the per-row reference).  ≤18-digit values convert
    # vectorized; longer ones (rare) go through Python int with a
    # ParseInt-style range check — out of int64 range → invalid, like
    # the reference's strconv.ParseInt error path
    time_reported = pd.Series(pd.NaT, index=idx, dtype="datetime64[ns]")
    tvals = ts_str[ts_digits].astype(object)
    if len(tvals):
        short = tvals.str.lstrip("-").str.len() <= 18
        time_reported[tvals.index[short]] = pd.to_datetime(
            tvals[short].astype("int64"), unit="ns", errors="coerce"
        )
        if (~short).any():
            long_vals = tvals[~short].map(int)
            # STRICT lower bound: -2^63 itself is the int64 NaT
            # sentinel — treat it as out of range like the overflow path
            in_range = long_vals.apply(lambda v: -(2**63) < v < 2**63)
            time_reported[long_vals.index[in_range]] = pd.to_datetime(
                long_vals[in_range].astype("int64"), unit="ns",
                errors="coerce",
            )
            bad_ts = bad_ts | pd.Series(
                idx.isin(long_vals.index[~in_range]), index=idx
            )

    # ---- measurement + tags ----
    head = _split_unescaped(meas_tags.fillna(""), ",", _RE_UNESC_COMMA)
    measurement = (
        head.str[0]
        .str.replace("\\ ", " ", regex=False)
        .str.replace("\\,", ",", regex=False)
        .fillna("")
    )
    # element 0 is the measurement; list-slice it off BEFORE exploding
    # (an explode + groupby-cumcount position filter was pure overhead).
    # astype(object): a batch with zero tags explodes to an EMPTY
    # float64 series, on which .str raises
    te = head.str[1:].explode().dropna().astype(object)
    tags_only = te[te.str.contains("=", regex=False, na=False)]
    tkv = tags_only.str.split("=", n=1, expand=True)
    for c in (0, 1):
        if c not in tkv.columns:
            tkv[c] = ""
    tk, tv = tkv[0].fillna(""), tkv[1].fillna("")
    hostname = tv[tk == "host"].groupby(level=0).last()
    tag_join = _segment_join(
        pd.Series(tags_only.index),
        tk,
        '"' + _json_escape(tk) + '":"' + _json_escape(tv) + '"',
    )

    # ---- fields: explode to one pairs table, classify vectorized ----
    fl = _split_unescaped(fields_str.fillna(""), ",", _RE_UNESC_COMMA)
    fe = fl.explode()
    has_eq = fe.str.contains("=", regex=False, na=False)
    fkv = fe.str.split("=", n=1, expand=True)
    for c in (0, 1):
        if c not in fkv.columns:
            fkv[c] = None
    fk, fv = fkv[0].fillna(""), fkv[1]

    is_int = fv.str.match(_RE_INT, na=False)
    is_bt = fv.isin(_BOOL_TRUE)
    is_bf = fv.isin(_BOOL_FALSE)
    is_str = (
        fv.str.len().ge(2).fillna(False)
        & fv.str.startswith('"', na=False)
        & fv.str.endswith('"', na=False)
    )
    # precedence per the reference: int, bool, quoted string, float
    is_str &= ~(is_int | is_bt | is_bf)
    is_flt = fv.str.match(_RE_FLOAT, na=False) & ~(is_int | is_bt | is_bf | is_str)
    classified = is_int | is_bt | is_bf | is_str | is_flt
    bad_pair = ~has_eq | (has_eq & ~classified)

    typed_key = pd.Series(
        np.select(
            [is_int, is_bt | is_bf, is_str, is_flt],
            [fk + "_integer", fk + "_boolean", fk + "_string", fk + "_float"],
            default=fk,
        ),
        index=fe.index,
    )
    typed_val = pd.Series("", index=fe.index, dtype="object")
    typed_val[is_int] = fv[is_int].str[:-1]
    typed_val[is_bt] = "true"
    typed_val[is_bf] = "false"
    typed_val[is_str] = (
        fv[is_str].str.slice(1, -1).str.replace('\\"', '"', regex=False)
    )
    if is_flt.any():
        # float(str) not pd.to_numeric: pandas' xstrtod is off by 1 ulp
        # on some inputs (caught by the fuzz — "…848405" parsed to
        # "…848403"); Python's float() is correctly rounded, matching
        # Go strconv.ParseFloat.  Per-element, but only over the
        # float-typed values (the documented canonicalization map)
        typed_val[is_flt] = fv[is_flt].map(lambda v: _go_float(float(v)))

    goodf = classified
    field_join = _segment_join(
        pd.Series(fe.index[goodf]),
        typed_key[goodf],
        '"' + _json_escape(typed_key[goodf]) + '":"'
        + _json_escape(typed_val[goodf]) + '"',
    )

    bad_rows = pd.Index(fe.index[bad_pair]).unique()
    valid = (
        (meas_tags.fillna("") != "")
        & fields_str.notna()
        & ~bad_ts
        & ~idx.isin(bad_rows)
        & idx.isin(field_join.index)
    )

    # ---- assemble (sort_keys order: influxdb_fields < influxdb_tags) ----
    props = (
        '{"influxdb_fields":{'
        + field_join.reindex(idx).fillna("")
        + '},"influxdb_tags":{'
        + tag_join.reindex(idx).fillna("")
        + "}}"
    )
    host = hostname.reindex(idx).fillna("")
    procid = pd.util.hash_pandas_object(s, index=False).astype(str)

    out = pd.DataFrame(index=idx)
    out["priority"] = np.where(valid, 16 * 8 + 6, 0).astype("int32")
    out["facility"] = np.where(valid, 16, 0).astype("int32")
    out["severity"] = np.where(valid, 6, 0).astype("int32")
    out["version"] = np.where(valid, 1, 0).astype("int32")
    out["time_reported"] = time_reported.where(valid)
    out["hostname"] = host.where(valid, "")
    out["appname"] = np.where(valid, "influxdb", "")
    out["procid"] = procid.where(valid, "")
    out["msgid"] = ""
    out["structured"] = ""
    out["message"] = measurement.where(valid, "")
    out["properties_json"] = props.where(valid, None)
    out["parse_ok"] = valid.to_numpy()
    out["parser_name"] = "influx"
    return out


@pandas_udf(PARSED_STRUCT)
def parse_influx_udf(text: pd.Series, ts: pd.Series) -> pd.DataFrame:
    return parse_influx_batch(text)


def parse_influx(df: DataFrame, text_col: str = "text", ts_col: str = "ts") -> DataFrame:
    parsed = df.withColumn("_p", parse_influx_udf(F.col(text_col), F.col(ts_col)))
    return parsed.select(
        "*", *[F.col(f"_p.{f.name}").alias(f.name) for f in PARSED_STRUCT.fields]
    ).drop("_p")
