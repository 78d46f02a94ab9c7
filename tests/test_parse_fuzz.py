"""Seeded fuzz: vectorized parser vs the independent per-row oracle.

Generates a few thousand adversarial syslog-ish lines — valid RFC5424 /
RFC3164, malformed PRIs, garbage timestamps, truncations, junk bytes,
odd whitespace — and asserts the pandas batch parser and the
independent reimplementation in tests/oracle.py agree on EVERY field.
Deterministic (seeded): failures reproduce.  Pure pandas, no Spark
session — runs in milliseconds.
"""

from __future__ import annotations

import random
import string

import pandas as pd

from skewer_spark.operators.parse import parse_batch
from tests import oracle

TS = pd.Timestamp("2026-01-05 10:20:30")

_PRINTABLE = string.ascii_letters + string.digits + " .:-_[]<>\"'=!@#"


def _gen_lines(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)

    def rnd_str(a, b, alphabet=_PRINTABLE):
        return "".join(rng.choice(alphabet) for _ in range(rng.randint(a, b)))

    def pri():
        r = rng.random()
        if r < 0.5:
            return f"<{rng.randint(0, 191)}>"
        if r < 0.6:
            return f"<{rng.randint(192, 9999)}>"   # out of range
        if r < 0.7:
            return "<" + rnd_str(0, 3, string.digits + "x") + ">"
        if r < 0.8:
            return ""                              # missing PRI
        return "<" + rnd_str(0, 2) + ">"

    def ts5424():
        r = rng.random()
        if r < 0.5:
            return (f"2026-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
                    f"T{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}"
                    f":{rng.randint(0, 59):02d}Z")
        if r < 0.6:
            return "2026-13-40T99:99:99Z"          # invalid
        if r < 0.7:
            return "-"
        return rnd_str(1, 10)

    def ts3164():
        mon = rng.choice(["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul",
                          "Aug", "Sep", "Oct", "Nov", "Dec", "Foo"])
        day = rng.choice([f"{rng.randint(1, 28):2d}", f"{rng.randint(1, 28)}"])
        return (f"{mon} {day} {rng.randint(0, 23):02d}"
                f":{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}")

    def host():
        return rng.choice([
            "host" + rnd_str(1, 5, string.ascii_lowercase + string.digits),
            "10.0.0." + str(rng.randint(0, 255)),
            "-", rnd_str(1, 8),
        ])

    def sd():
        r = rng.random()
        if r < 0.5:
            return "-"
        k = rnd_str(1, 5, string.ascii_lowercase)
        v = rnd_str(0, 8).replace("\\", "").replace('"', "").replace("]", "")
        return f'[ex@123 {k}="{v}"]'

    out = []
    for _ in range(n):
        shape = rng.random()
        if shape < 0.35:
            out.append(
                f"{pri()}1 {ts5424()} {host()} app{rng.randint(0, 99)} "
                f"{rng.randint(1, 9999)} MSG{rng.randint(0, 99)} {sd()} "
                + rnd_str(0, 40)
            )
        elif shape < 0.6:
            out.append(
                f"{pri()}{ts3164()} {host()} "
                f"app{rng.randint(0, 99)}[{rng.randint(1, 999)}]: "
                + rnd_str(0, 40)
            )
        elif shape < 0.7:
            out.append(f"{pri()}{ts3164()} {host()} " + rnd_str(0, 30))
        elif shape < 0.8:
            out.append(rnd_str(0, 60))             # pure junk
        elif shape < 0.9:
            line = (f"{pri()}1 {ts5424()} {host()} a 1 m {sd()} payload")
            out.append(line[: rng.randint(0, len(line))])  # truncation
        else:
            out.append(rng.choice(["", " ", "<>", "<1>", "<189>  ",
                                   "\t<34>1 - - - - - -"]))
    return out


def test_fuzz_vectorized_matches_oracle():
    lines = _gen_lines(2500, seed=20260816)
    res = parse_batch(pd.Series(lines), pd.Series([TS] * len(lines)))
    mismatches = []
    for i, line in enumerate(lines):
        m = oracle.parse_line(line, TS.year)
        row = res.iloc[i]
        for f in ("priority", "facility", "severity", "version", "hostname",
                  "appname", "procid", "msgid", "message", "parse_ok",
                  "parser_name"):
            if row[f] != getattr(m, f):
                mismatches.append((line, f, row[f], getattr(m, f)))
                break
        else:
            exp_tr = m.time_reported
            got = row["time_reported"]
            ok = pd.isna(got) if exp_tr is None else got == pd.Timestamp(exp_tr)
            if not ok:
                mismatches.append((line, "time_reported", got, exp_tr))
    assert not mismatches, f"{len(mismatches)} disagreements; first 5: {mismatches[:5]}"
