"""Seeded fuzz of the vectorized Influx line-protocol decoder against an
independent per-row reference implementation.

``parse_influx_batch`` is the repo's most intricate hand-vectorized
parser (escape-aware splits, type suffixing, sorted segment-joins); the
reference below re-derives the same contract (from
``/root/reference/decoders/influxdb.go:13-95`` + the documented
deviations in decode_influx.py) with a plain character scanner — no
pandas ``.str`` machinery — so a bug in the vectorized fast paths
cannot hide in a shared helper.  Runs pure-pandas (no JVM): the Spark
plumbing is covered by the golden test in test_rules_influx.py.
"""

from __future__ import annotations

import json
import random
import re

import pandas as pd

from skewer_spark.operators.decode_influx import parse_influx_batch

_INT = re.compile(r"^-?\d+i$")
_FLOAT = re.compile(r"^-?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$")
_TS = re.compile(r"^-?\d+$")
_TRUE = ("t", "T", "true", "True", "TRUE")
_FALSE = ("f", "F", "false", "False", "FALSE")


def _scan_split(s: str, sep: str, maxsplit: int = -1) -> list[str]:
    """Split on ``sep`` not immediately preceded by a backslash."""
    out, cur, n = [], [], 0
    for i, ch in enumerate(s):
        if ch == sep and (i == 0 or s[i - 1] != "\\") and n != maxsplit:
            out.append("".join(cur))
            cur = []
            n += 1
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def _jesc(s: str) -> str:
    out = s.replace("\\", "\\\\").replace('"', '\\"')
    return re.sub(r"[\x00-\x1f]", lambda m: "\\u%04x" % ord(m.group()), out)


def _gofloat(v: str) -> str:
    r = repr(float(v))
    if "e" in r:  # strip zeros from the MANTISSA only, never the exponent
        m, e = r.split("e")
        if "." in m:
            m = m.rstrip("0").rstrip(".")
        return m + "e" + e
    return r.rstrip("0").rstrip(".") if "." in r else r


def _ref_decode(line: str) -> dict | None:
    """None = parse_ok False; else the expected parsed fields."""
    s = line.strip()
    toks = _scan_split(s, " ", maxsplit=2)
    meas_tags = toks[0] if toks else ""
    fields_str = toks[1] if len(toks) > 1 else None
    ts_str = toks[2] if len(toks) > 2 else None

    if meas_tags == "" or fields_str is None:
        return None
    ts = None
    if ts_str not in (None, ""):
        if not _TS.match(ts_str):
            return None
        v = int(ts_str)
        # strict: -2^63 itself is the int64 NaT sentinel, treated as
        # out of range like the ParseInt overflow path
        if not -(2**63) < v < 2**63:
            return None
        ts = pd.to_datetime(v, unit="ns", errors="coerce")

    head = _scan_split(meas_tags, ",")
    measurement = head[0].replace("\\ ", " ").replace("\\,", ",")
    tags: dict[str, str] = {}
    hostname = ""
    for el in head[1:]:
        if "=" not in el:
            continue  # tag element without '=' is silently dropped
        k, v = el.split("=", 1)
        tags[k] = v  # raw: tag keys/values are NOT unescaped
        if k == "host":
            hostname = v

    fields: dict[str, str] = {}
    for el in _scan_split(fields_str, ","):
        if "=" not in el:
            return None
        k, v = el.split("=", 1)
        if _INT.match(v):
            fields[k + "_integer"] = v[:-1]
        elif v in _TRUE:
            fields[k + "_boolean"] = "true"
        elif v in _FALSE:
            fields[k + "_boolean"] = "false"
        elif len(v) >= 2 and v.startswith('"') and v.endswith('"'):
            fields[k + "_string"] = v[1:-1].replace('\\"', '"')
        elif _FLOAT.match(v):
            fields[k + "_float"] = _gofloat(v)
        else:
            return None
    if not fields:
        return None

    props = (
        '{"influxdb_fields":{'
        + ",".join(f'"{_jesc(k)}":"{_jesc(v)}"'
                   for k, v in sorted(fields.items()))
        + '},"influxdb_tags":{'
        + ",".join(f'"{_jesc(k)}":"{_jesc(v)}"'
                   for k, v in sorted(tags.items()))
        + "}}"
    )
    return {
        "message": measurement,
        "hostname": hostname,
        "time_reported": ts,
        "properties_json": props,
    }


def _gen_line(rng: random.Random) -> str:
    def name():
        base = rng.choice(["cpu", "disk io", "mem,free", "wëird", "m"])
        return base.replace(" ", "\\ ").replace(",", "\\,")

    def tagkv():
        k = rng.choice(["host", "region", "dc", "a=b", ""])
        v = rng.choice(["server01", "us west", "a\\,b", "", "x=y", "méx"])
        return f"{k}={v}" if rng.random() < 0.9 else k  # 10%: no '='

    def fieldkv():
        k = rng.choice(["count", "usage_idle", "ok", "note", "x"])
        if rng.random() < 0.04:  # malformed value (row-invalidating)
            v = rng.choice(["0x1f", "1i2", "tru", '"unterminated'])
        else:
            v = rng.choice([
                f"{rng.randint(-99999, 99999)}i",
                str(rng.uniform(-1e6, 1e6)),
                f"{rng.uniform(-1, 1):.3e}",
                str(rng.randint(-999, 999)),
                ".5", "-.25", "3.",
                # exponent-form reprs: a whole-repr rstrip("0") mangles
                # these ('1.5e+20' → '1.5e+2'; caught by review)
                "1.5e20", "1.5e-10", "2e300", "5e-324", "-2.25e19",
                rng.choice(_TRUE + _FALSE),
                '"hi there"', '"say \\"hi\\""', '"tab\there"', '""',
            ])
        return f"{k}={v}" if rng.random() < 0.96 else k  # 4%: no '='

    parts = [name() + "".join("," + tagkv() for _ in range(rng.randint(0, 3)))]
    if rng.random() < 0.95:  # 5%: measurement only (invalid)
        parts.append(",".join(fieldkv() for _ in range(rng.randint(1, 4))))
        r = rng.random()
        if r < 0.4:
            # exercise every ts width: small, ns-scale (>2^53 — the
            # float64 rounding trap), 19-digit near-2^63, and overflow
            parts.append(str(rng.choice([
                rng.randint(0, 10**9),
                rng.randint(10**18, 2**62),
                rng.randint(2**62, 2**63 + 2**10),
                rng.randint(2**64, 2**70),
                -rng.randint(10**18, 2**63 + 2**10),
            ])))
        elif r < 0.5:
            parts.append(rng.choice(["-1", "12ab", "1.5", ""]))
        if rng.random() < 0.05:
            parts.append("trailing junk")
    return " ".join(parts)


def test_influx_fuzz_vs_independent_reference():
    rng = random.Random(0xC0FFEE)
    lines = [_gen_line(rng) for _ in range(5000)]
    got = parse_influx_batch(pd.Series(lines))

    n_valid = 0
    for i, line in enumerate(lines):
        exp = _ref_decode(line)
        row = got.iloc[i]
        assert bool(row["parse_ok"]) == (exp is not None), (
            f"line {i}: ok={row['parse_ok']} expected {exp is not None}: "
            f"{line!r}")
        if exp is None:
            assert row["properties_json"] is None
            continue
        n_valid += 1
        for col in ("message", "hostname", "properties_json"):
            assert row[col] == exp[col], (
                f"line {i} col {col}: {row[col]!r} != {exp[col]!r}: {line!r}")
        if exp["time_reported"] is None:
            assert pd.isna(row["time_reported"])
        else:
            assert row["time_reported"] == exp["time_reported"], line
        # properties must be real JSON with the documented shape
        j = json.loads(row["properties_json"])
        assert set(j) == {"influxdb_fields", "influxdb_tags"}
        assert (row["priority"], row["facility"], row["severity"]) == (134, 16, 6)
    # the generator must exercise both verdicts heavily
    assert 1000 < n_valid < 4500, n_valid
