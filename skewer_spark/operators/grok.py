"""Grok pattern compiler — declarative regex parsing for log lines.

The reference parses each syslog flavor with a dedicated hand-written
decoder (``/root/reference/decoders/parse.go:51-87`` dispatches on
format name); operators who need a NEW line format must write Go.  The
industry-standard declarative alternative is grok (Logstash):
``%{PATTERN:field}`` templates compiled down to one regex.  This module
implements that compiler for the Spark pipeline so a new log format is
a one-line pattern string, not code — the "grok/regex parsing" surface
the north rule names.

Everything compiles to ONE Java regex evaluated JVM-side
(``regexp_extract`` / ``rlike``, whole-stage codegen — no Python in the
hot path).  The pattern library is written in the common
Java-regex ∩ RE2 subset (no lookaround, no backrefs, no possessive
quantifiers) so compiled patterns run unchanged on Spark, DuckDB,
Trino, or Go's regexp — which is also what makes the DuckDB oracle
(`q_grok`) a real cross-engine check.

Scale shape: narrow map riding the scan, zero shuffles.  Each named
field is one ``regexp_extract(col, rx, i)`` call; Catalyst does not
CSE the shared match across group indices, so a k-field pattern costs
k regex passes per row — fine for bounded log lines (the scan
dominates); for very wide patterns prefer splitting into two grok
stages anchored on a cheap prefix.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Core pattern library — the standard grok names (subset of
# logstash-patterns-core, rewritten in the Java∩RE2 regex subset; all
# groups non-capturing so expansion never shifts user group indexes).
GROK_PATTERNS: dict[str, str] = {
    "INT": r"[+-]?\d+",
    "POSINT": r"\b[1-9]\d*\b",
    "NONNEGINT": r"\b\d+\b",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    # logstash QUOTEDSTRING uses backrefs; this form is backref-free
    "QUOTEDSTRING": "(?:\"[^\"]*\"|'[^']*')",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "IPV4": (
        r"(?:(?:25[0-5]|2[0-4]\d|[01]?\d?\d)\.){3}"
        r"(?:25[0-5]|2[0-4]\d|[01]?\d?\d)"
    ),
    "IP": r"%{IPV4}",
    "HOSTNAME": (
        r"\b[a-zA-Z0-9][a-zA-Z0-9\-]{0,62}"
        r"(?:\.[a-zA-Z0-9][a-zA-Z0-9\-]{0,62})*\.?\b"
    ),
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "MONTH": r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)",
    "MONTHDAY": r"(?:0[1-9]|[12]\d|3[01]|[1-9])",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?\d)",
    "MINUTE": r"[0-5]\d",
    "SECOND": r"(?:[0-5]\d|60)(?:\.\d+)?",
    "TIME": r"%{HOUR}:%{MINUTE}:%{SECOND}",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "TIMESTAMP_ISO8601": (
        r"\d{4}-\d{2}-\d{2}[T ]%{HOUR}:%{MINUTE}"
        r"(?::%{SECOND})?(?:Z|[+-]%{HOUR}:?%{MINUTE})?"
    ),
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "LOGLEVEL": (
        r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|"
        r"NOTICE|[Ii]nfo|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|"
        r"[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|"
        r"[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|"
        r"[Ee]merg(?:ency)?)"
    ),
    "PROG": r"[\w._/%-]+",
    "SYSLOGPROG": r"%{PROG:program}(?:\[%{POSINT:pid}\])?",
    "SYSLOGHOST": r"%{IPORHOST}",
    "SYSLOGBASE": (
        r"%{SYSLOGTIMESTAMP:timestamp} %{SYSLOGHOST:logsource} "
        r"%{SYSLOGPROG}:"
    ),
    "COMMONAPACHELOG": (
        r"%{IPORHOST:clientip} %{USER:ident} %{USER:auth} "
        r"\[%{HTTPDATE:timestamp}\] "
        r"\"(?:%{WORD:verb} %{NOTSPACE:request}"
        r"(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})\" "
        r"%{NONNEGINT:response} (?:%{NONNEGINT:bytes}|-)"
    ),
}

_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def compile_grok(
    pattern: str,
    extra_patterns: dict[str, str] | None = None,
    max_depth: int = 16,
) -> tuple[str, list[str]]:
    """Expand a grok template to ``(java_regex, ordered_field_names)``.

    ``%{NAME:field}`` becomes a capturing group, ``%{NAME}`` a
    non-capturing one; library patterns may themselves reference other
    patterns (and carry named fields, e.g. SYSLOGPROG), expanded
    depth-first so ``fields[i]`` is exactly capture group ``i+1``.
    Unknown names and duplicate field names raise; recursion is bounded
    (a cyclic library would otherwise hang the driver).
    """
    lib = dict(GROK_PATTERNS)
    if extra_patterns:
        lib.update(extra_patterns)
    fields: list[str] = []

    def expand(p: str, depth: int) -> str:
        if depth > max_depth:
            raise ValueError(
                f"grok expansion deeper than {max_depth} — "
                "cyclic pattern library?"
            )
        out, pos = [], 0
        for m in _GROK_REF.finditer(p):
            out.append(p[pos : m.start()])
            name, field = m.group(1), m.group(2)
            if name not in lib:
                raise KeyError(f"unknown grok pattern %{{{name}}}")
            if field:
                # append BEFORE recursing: the outer '(' opens first,
                # so its group index precedes any nested named groups
                fields.append(field)
                out.append("(" + expand(lib[name], depth + 1) + ")")
            else:
                out.append("(?:" + expand(lib[name], depth + 1) + ")")
            pos = m.end()
        out.append(p[pos:])
        return "".join(out)

    rx = expand(pattern, 0)
    dupes = {f for f in fields if fields.count(f) > 1}
    if dupes:
        raise ValueError(f"duplicate grok field names: {sorted(dupes)}")
    # fields[i] ↔ group i+1 holds ONLY if the template adds no capturing
    # groups of its own: one bare '(' in user input silently shifts
    # every named field one group over (w extracts the wrong text, no
    # error).  Count capture groups in the expanded regex — the library
    # is all non-capturing, so any excess is user-introduced.
    n_caps = _count_capture_groups(rx)
    if n_caps != len(fields):
        raise ValueError(
            f"template introduces {n_caps - len(fields)} raw capturing "
            "group(s), which would misalign %{NAME:field} extraction — "
            "use non-capturing (?:...) instead"
        )
    return rx, fields


def _count_capture_groups(rx: str) -> int:
    """Capturing groups in a Java∩RE2 regex: bare ``(`` plus named
    ``(?<name>…)`` (which captures in Java), excluding ``(?:``,
    lookarounds and flags; class/escape aware."""
    n, i, in_class = 0, 0, False
    while i < len(rx):
        ch = rx[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            in_class = ch != "]"
        elif ch == "[":
            in_class = True
        elif ch == "(":
            nxt = rx[i + 1 : i + 2]
            if nxt != "?":
                n += 1
            elif rx[i + 2 : i + 3] == "<" and rx[i + 3 : i + 4] not in ("=", "!"):
                n += 1  # (?<name>…) captures in Java regex
        i += 1
    return n


def grok_extract(
    df: DataFrame,
    pattern: str,
    text_col: str = "text",
    prefix: str = "",
    extra_patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Append one string column per named field plus ``grok_match``.

    Match semantics follow grok/regexp_extract: the pattern may match
    anywhere in the line (anchor with ``^``/``$`` in the template for
    full-line matches); non-matching rows get ``grok_match=false`` and
    empty strings (cast downstream as needed — grok type coercions
    like ``:int`` are a ``.cast`` away and deliberately not magic
    here).
    """
    rx, fs = compile_grok(pattern, extra_patterns)
    if not fs:
        raise ValueError("pattern has no named fields — use rlike")
    c = F.col(text_col)
    return df.select(
        "*",
        c.rlike(rx).alias(prefix + "grok_match"),
        *[
            F.regexp_extract(c, rx, i + 1).alias(prefix + f)
            for i, f in enumerate(fs)
        ],
    )


def grok_filter(
    df: DataFrame,
    pattern: str,
    text_col: str = "text",
    extra_patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Rows whose ``text_col`` matches the grok template (rlike)."""
    rx, _ = compile_grok(pattern, extra_patterns)
    return df.filter(F.col(text_col).rlike(rx))
