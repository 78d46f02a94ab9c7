"""Pure-Python per-row oracle: an INDEPENDENT re-implementation of the
reference parse → enrich → route semantics, written line-by-line from
the Go sources (/root/reference/decoders/rfc3164_format.go,
rfc5424_format.go + grammar, store/forwarder.go, javascript/vm.go).

Deliberately row-at-a-time and unoptimized — it exists only to validate
the vectorized pipeline on fixtures.  Shares no code with
skewer_spark.operators.parse.
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass, field
from datetime import datetime, timezone

MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
          "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

FACILITIES = {
    0: "kern", 1: "user", 2: "mail", 3: "daemon", 4: "auth", 5: "syslog",
    6: "lpr", 7: "news", 8: "uucp", 9: "clock", 10: "authpriv", 11: "ftp",
    12: "ntp", 13: "logaudit", 14: "logalert", 15: "cron", 16: "local0",
    17: "local1", 18: "local2", 19: "local3", 20: "local4", 21: "local5",
    22: "local6", 23: "local7",
}
SEVERITIES = {0: "emerg", 1: "alert", 2: "crit", 3: "err", 4: "warning",
              5: "notice", 6: "info", 7: "debug"}


@dataclass
class Msg:
    priority: int = 0
    facility: int = 0
    severity: int = 0
    version: int = 0
    time_reported: datetime | None = None  # None = "now" (row ts)
    hostname: str = ""
    appname: str = ""
    procid: str = ""
    msgid: str = ""
    structured: str = ""
    message: str = ""
    properties: dict = field(default_factory=dict)
    parse_ok: bool = True
    parser_name: str = "rfc3164"


def parse_tag(tag: str) -> tuple[str, str]:
    """rfc3164_format.go:168-185."""
    tag = tag.strip(":")
    i = tag.find("[")
    appname, procid = "", ""
    if i >= 0 and len(tag) > i + 1:
        j = tag.find("]")
        if j > i:
            procid = tag[i + 1:j]
        else:
            procid = tag[i + 1:]
        if i > 0:
            appname = tag[0:i]
    else:
        appname = tag
    return appname, procid


def is_hostname(s: str) -> bool:
    """rfc3164_format.go:187-194."""
    for ch in s:
        if not (ch.isalpha() or ch.isnumeric()
                or ch in (".", ":", "-", "_")):
            return False
    return True


RE_3339 = re.compile(
    r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})$")


def parse_rfc3339(s: str) -> datetime | None:
    if not RE_3339.match(s):
        return None
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return None
    return dt.astimezone(timezone.utc).replace(tzinfo=None)


def parse_stamp(s: str, year: int) -> datetime | None:
    """Go time.Stamp 'Jan _2 15:04:05' + AddDate(year,0,0)."""
    parts = s.split(" ")
    if len(parts) != 3:
        return None
    mon, day, tm = parts
    if mon not in MONTHS or not re.fullmatch(r"\d{1,2}", day or ""):
        return None
    if not re.fullmatch(r"\d{2}:\d{2}:\d{2}", tm):
        return None
    try:
        return datetime(year, MONTHS.index(mon) + 1, int(day),
                        int(tm[0:2]), int(tm[3:5]), int(tm[6:8]))
    except ValueError:
        return None


def p3164(line: str, ts_year: int) -> Msg:
    """rfc3164_format.go:28-166, faithful branch-for-branch."""
    m = line.strip()
    msg = Msg(parser_name="rfc3164")

    def default():
        d = Msg(parser_name="rfc3164")
        d.message = m
        return d

    if not m.startswith("<"):
        return default()
    pri_end = m.find(">")
    if pri_end <= 1:
        return default()
    pri_str = m[1:pri_end]
    if not re.fullmatch(r"\d{1,9}", pri_str):  # spec: 1-9 digits
        return default()
    pri = int(pri_str)
    msg.priority, msg.facility, msg.severity = pri, pri // 8, pri % 8

    if len(m) <= pri_end + 1:
        return msg
    m = m[pri_end + 1:].strip()
    if not m:
        return msg

    s = m.split(" ")  # bytes.Split: every single space
    if "0" <= m[0] <= "9":
        t = parse_rfc3339(s[0])
        if t is None:
            msg.message = m
            return msg
        msg.time_reported = t
        if len(s) == 1:
            return msg
        s = s[1:]
    else:
        if len(s) < 3:
            msg.message = m
            return msg
        t = parse_stamp(" ".join(s[0:3]), ts_year)
        if t is None:
            msg.message = m
            return msg
        msg.time_reported = t
        if len(s) == 3:
            return msg
        s = s[3:]

    if len(s) == 1:
        msg.message = s[0]
        return msg
    if len(s) == 2:
        if s[0].count(":") == 7 or s[0].count(".") == 3:
            msg.hostname = s[0]
            if any(c in s[1] for c in "[]:"):
                msg.appname, msg.procid = parse_tag(s[1])
            else:
                msg.message = s[1]
            return msg
        if any(c in s[0] for c in "[]:"):
            msg.appname, msg.procid = parse_tag(s[0])
            msg.message = s[1]
            return msg
        if any(c in s[1] for c in "[]:"):
            # reference quirk: tag parsed from s[0] (rfc3164_format.go:142-146)
            msg.hostname = s[0]
            msg.appname, msg.procid = parse_tag(s[0])
            return msg
        msg.appname = s[0]
        msg.message = s[1]
        return msg
    if any(c in s[0] for c in "[]:") or not is_hostname(s[0]):
        msg.appname, msg.procid = parse_tag(s[0])
        msg.message = " ".join(s[1:])
        return msg
    msg.hostname = s[0]
    msg.appname, msg.procid = parse_tag(s[1])
    msg.message = " ".join(s[2:])
    return msg


RE_HEAD = re.compile(
    r"^<(\d{1,9})>(\d{1,9}) +([^ ]+) +([^ ]+) +([^ ]+) +([^ ]+) +([^ ]+) +(.*)$",
    re.S)
RE_SD_BLOCK = re.compile(r"^((?:\[(?:\\.|[^\]\\])*\])+)(?: +(.*))?$", re.S)
RE_SD_ELEM = re.compile(r"\[([^\]\\ =]+)((?:\\.|[^\]\\])*)\]")
RE_SD_PARAM = re.compile(r'([^=\s\]]+)="((?:\\.|[^"\\])*)"')


def p5424(line: str) -> Msg:
    msg = Msg(parser_name="rfc5424")

    def err():
        e = Msg(parser_name="rfc5424")
        e.parse_ok = False
        return e

    mt = RE_HEAD.match(line.strip())
    if not mt:
        return err()
    pri = int(mt.group(1))
    msg.priority, msg.facility, msg.severity = pri, pri // 8, pri % 8
    msg.version = int(mt.group(2))
    ts = mt.group(3)
    if ts != "-":
        t = parse_rfc3339(ts)
        if t is None:
            return err()
        msg.time_reported = t
    for gi, name in ((4, "hostname"), (5, "appname"), (6, "procid"),
                     (7, "msgid")):
        v = mt.group(gi)
        setattr(msg, name, "" if v == "-" else v)
    rest = mt.group(8)
    if rest == "-":
        return msg
    if rest.startswith("- "):
        msg.message = rest[2:].lstrip(" ")
        return msg
    bm = RE_SD_BLOCK.match(rest)
    if not bm:
        return err()
    if bm.group(2) is not None:
        msg.message = bm.group(2)
    for sid, ptxt in RE_SD_ELEM.findall(bm.group(1)):
        msg.properties[sid] = {}
        for k, v in RE_SD_PARAM.findall(ptxt):
            msg.properties[sid][k] = v
    return msg


def parse_line(line: str, ts_year: int) -> Msg:
    if re.match(r"^<\d{1,9}>\d{1,9} ", line.strip()):
        return p5424(line)
    return p3164(line, ts_year)


# ---------------------------------------------------------------------------
# enrich + route oracle
# ---------------------------------------------------------------------------

def uid_of(conv_id: str, turn_idx: int) -> str:
    return hashlib.sha256(
        f"{conv_id}\x1f{turn_idx}".encode()).hexdigest()


def enrich_route_row(row: dict) -> dict:
    """row: conv_id, turn_idx, role, text, tool, ts (datetime, UTC-naive).

    Returns the routed record as a flat dict.
    """
    ts = row["ts"]
    m = parse_line(row["text"], ts.year)
    uid = uid_of(row["conv_id"], row["turn_idx"])

    facility_name = FACILITIES.get(m.facility, "user")
    severity_name = SEVERITIES.get(m.severity, "info")
    time_reported = m.time_reported if m.time_reported is not None else ts
    msgid = m.msgid if m.msgid else uid

    if m.severity == 7:
        status = "DROPPED"
    elif "REJECTME" in m.message:
        status = "REJECTED"
    elif not m.parse_ok:
        status = "ERROR"
    else:
        status = "PASS"

    app = m.appname if m.appname else "unknown"
    topic = f"syslog-{app}"
    if not re.fullmatch(r"[A-Za-z0-9._-]{1,249}", topic):
        topic = "default-topic"
    partition_key = f"mypk-{m.hostname}"

    sinks = []
    if status == "PASS":
        if m.severity <= 3:
            sinks.append("sink_alerts")
        if row["tool"] != "none":
            sinks.append("sink_tools")
        sinks.append("sink_firehose")
    elif status in ("REJECTED", "ERROR"):
        sinks.append("sink_rejects")

    return {
        "uid": uid,
        "conv_id": row["conv_id"],
        "turn_idx": row["turn_idx"],
        "role": row["role"],
        "tool": row["tool"],
        "ts": ts,
        "priority": m.priority,
        "facility": m.facility,
        "severity": m.severity,
        "version": m.version,
        "time_reported": time_reported,
        "time_generated": ts,
        "hostname": m.hostname,
        "appname": m.appname,
        "procid": m.procid,
        "msgid": msgid,
        "message": m.message,
        "properties": json.dumps(m.properties, sort_keys=True,
                                 separators=(",", ":")) if m.properties else None,
        "parse_ok": m.parse_ok,
        "parser_name": m.parser_name,
        "facility_name": facility_name,
        "severity_name": severity_name,
        "filter_status": status,
        "topic": topic,
        "partition_key": partition_key,
        "sinks": sinks,
    }
