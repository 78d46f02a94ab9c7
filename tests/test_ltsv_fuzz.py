"""Seeded fuzz of the pure-expression LTSV decoder against an
independent per-row reference (plain string ops, no Spark expressions).

This fuzz is what exposed the ``str_to_map`` duplicate-label job abort
(Spark's default ``mapKeyDedupPolicy=EXCEPTION``) that the decoder now
guards against with an explicit keep-last entry dedup.
"""

from __future__ import annotations

import json
import random
import re

import pandas as pd

from skewer_spark.operators.decode_json import parse_ltsv

LABELS = ["time", "host", "ident", "pid", "msg", "message", "pri",
          "status", "ua", "wëird label", ""]
VALUES = ["a", "server 01", "x:y:z", "", "2024-03-05T06:07:08Z",
          "165", "-1", "späß", "v\\w", '"q"', "t:"]


def _ref_decode(line: str) -> dict:
    pairs = line.split("\t")
    # decoder contract: labels past the 256th are truncated and the
    # line is flagged malformed (bounds the O(k²) dedup — ADVICE r02)
    over_cap = len(pairs) > 256
    pairs = pairs[:256]
    entries = []
    for p in pairs:
        if ":" in p:
            k, v = p.split(":", 1)
        else:
            k, v = p, None
        entries.append((k, v))
    # keep-last dedup
    m: dict[str, str | None] = {}
    for k, v in entries:
        m[k] = v
    ok = len(m) > 0 and all(v is not None for v in m.values()) and not over_cap
    if not ok:
        return {"parse_ok": False, "properties_json": None,
                "hostname": "", "appname": "", "procid": "",
                "message": "", "priority": 0, "time_reported": None}
    pri = m.get("pri")
    try:
        pri_i = int(pri) if pri is not None and pri.strip() else None
        # Spark int cast accepts leading/trailing spaces and +- signs;
        # the generator only emits plain digits or garbage, so plain
        # int() with a fallback mirrors it for the generated corpus
    except ValueError:
        pri_i = None
    # only pin the timestamp for unambiguous ISO values — Spark's and
    # pandas' fallback parsing of garbage strings legitimately differ,
    # and parse_ltsv's contract there is only "null or best effort"
    ts = None
    t = m.get("time")
    if t is not None and re.match(r"^\d{4}-\d{2}-\d{2}T", t):
        p = pd.Timestamp(t)
        ts = (p.tz_convert("UTC").tz_localize(None)
              if p.tzinfo else p.tz_localize(None))
    return {
        "parse_ok": True,
        "properties_json": json.dumps({"ltsv": dict(sorted(m.items()))},
                                      separators=(",", ":"),
                                      ensure_ascii=False),
        "hostname": m.get("host", ""),
        "appname": m.get("ident", ""),
        "procid": m.get("pid", ""),
        "message": m.get("msg", m.get("message", "")),
        "priority": pri_i if pri_i is not None else 0,
        "time_reported": ts,
    }


def _gen_line(rng: random.Random) -> str:
    n = rng.randint(1, 6)
    parts = []
    for _ in range(n):
        if rng.random() < 0.06:
            parts.append(rng.choice(["nocolon", "", "just text"]))
        else:
            parts.append(f"{rng.choice(LABELS)}:{rng.choice(VALUES)}")
    return "\t".join(parts)


def test_ltsv_fuzz_vs_independent_reference(spark):
    rng = random.Random(0x17_5E_ED)
    lines = [_gen_line(rng) for _ in range(1500)]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(lines)], "id int, text string"
    )
    got = {r.id: r for r in parse_ltsv(df).collect()}

    n_ok = 0
    for i, line in enumerate(lines):
        exp = _ref_decode(line)
        row = got[i]
        assert row.parse_ok == exp["parse_ok"], f"line {i}: {line!r}"
        if not exp["parse_ok"]:
            assert row.properties_json is None
            continue
        n_ok += 1
        for col in ("hostname", "appname", "procid", "message", "priority"):
            assert getattr(row, col) == exp[col], (
                f"line {i} col {col}: {getattr(row, col)!r} != "
                f"{exp[col]!r}: {line!r}")
        assert json.loads(row.properties_json) == json.loads(
            exp["properties_json"]), f"line {i}: {line!r}"
        if exp["time_reported"] is not None:
            assert row.time_reported == exp["time_reported"], f"line {i}: {line!r}"
    assert 300 < n_ok < 1450, n_ok


def test_ltsv_adversarial_label_count_is_bounded(spark):
    """ADVICE r02: a line with hundreds of thousands of tokens must not
    stall its task inside the O(k²) dedup.  The decoder truncates at
    256 labels and flags the line malformed; wall time stays bounded."""
    import time

    bomb = "\t".join(f"k{i}:v" for i in range(500_000))
    edge = "\t".join(f"k{i}:v" for i in range(256))     # exactly at cap
    df = spark.createDataFrame(
        [(0, bomb), (1, edge), (2, "a:1\tb:2")], "id int, text string"
    )
    t0 = time.monotonic()
    rows = {r.id: r for r in parse_ltsv(df).collect()}
    assert time.monotonic() - t0 < 60
    assert rows[0].parse_ok is False and rows[0].properties_json is None
    assert rows[1].parse_ok is True
    assert len(json.loads(rows[1].properties_json)["ltsv"]) == 256
    assert rows[2].parse_ok is True
