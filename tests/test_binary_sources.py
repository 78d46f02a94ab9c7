"""GELF chunked/compressed datagrams + acct(5) binary decode."""

from __future__ import annotations

import gzip
import json
import struct
import zlib

from pyspark.sql import functions as F

GELF_DOC = {
    "version": "1.1", "host": "gh", "short_message": "chunky",
    "timestamp": 1767225600.0, "level": 4, "facility": "auth",
}


def _chunks(payload: bytes, msg_id: bytes, n: int) -> list[bytes]:
    size = (len(payload) + n - 1) // n
    return [
        b"\x1e\x0f" + msg_id + bytes([i, n])
        + payload[i * size:(i + 1) * size]
        for i in range(n)
    ]


def test_gelf_datagram_reassembly(spark):
    from skewer_spark.sources.binary import reassemble_gelf_datagrams

    doc = json.dumps(GELF_DOC).encode()
    zdoc = zlib.compress(json.dumps({**GELF_DOC, "host": "zh"}).encode())
    gdoc = gzip.compress(json.dumps({**GELF_DOC, "host": "gzh"}).encode())
    datagrams = _chunks(doc, b"AAAAAAAA", 3) + [zdoc, gdoc, doc]
    # duplicate chunk (UDP retransmit) and an incomplete group
    datagrams.append(datagrams[0])
    datagrams += _chunks(doc, b"BBBBBBBB", 4)[:2]  # 2 of 4 → dropped
    df = spark.createDataFrame([(d,) for d in datagrams], "payload binary")
    out = reassemble_gelf_datagrams(df)
    texts = [r.text for r in out.collect()]
    assert len(texts) == 4
    hosts = sorted(json.loads(t)["host"] for t in texts)
    assert hosts == ["gh", "gh", "gzh", "zh"]

    # chained decode: the only GELF path real UDP data takes
    from skewer_spark.operators.decode_json import parse_gelf
    parsed = parse_gelf(out).collect()
    assert all(p.parse_ok for p in parsed)
    assert {p.severity for p in parsed} == {4}
    assert {p.facility for p in parsed} == {4}  # "auth"


def _acct_record(flag=0x01, tty=3, exitcode=0, uid=1000, gid=100, pid=4242,
                 ppid=1, btime=1767225600, etime=2.5,
                 utime=(3 << 13) | 100, stime=50, mem=200, io=7,
                 comm=b"ls\x00garbage\x00\x00\x00\x00"):
    return struct.pack(
        "<BBH6If8H16s", flag, 3, tty, exitcode, uid, gid, pid, ppid,
        btime, etime, utime, stime, mem, io, 0, 0, 0, 0, comm,
    )


def test_acct_v3_decode(spark):
    from skewer_spark.sources.binary import decode_acct_records

    rows = [(_acct_record(),),
            (_acct_record(flag=0x02 | 0x10, pid=77,
                          comm=b"bash" + b"\x00" * 12),),
            (b"short",)]
    df = spark.createDataFrame(rows, "payload binary")
    out = {r.pid: r for r in decode_acct_records(df).collect()}
    r = out[4242]
    assert r.comm == "ls"              # strnlen at first NUL
    assert (r.uid, r.gid, r.ppid) == (1000, 100, 1)
    assert str(r.btime).startswith("2026-01-01")
    # comp_t: (3<<13)|100 → 100 << 9 ticks = 51200; AHZ=100 →
    # 51200*1000/100 ms = 512000 ms = 512e9 ns
    assert r.utime_ns == 512_000_000_000
    assert r.stime_ns == 50 * 1000 // 100 * 1_000_000
    assert r.etime_ns == int(2.5 * 1000) // 100 * 1_000_000
    assert r.flags == "forked"
    r2 = out[None] if None in out else [x for x in out.values() if not x.decode_ok][0]
    assert not r2.decode_ok
    flags2 = [x.flags for x in out.values() if x.comm == "bash"][0]
    assert flags2 == "superuser,killedbysignal"


def test_acct_to_canonical(spark):
    from skewer_spark.sources.binary import acct_to_canonical, decode_acct_records

    df = spark.createDataFrame([(_acct_record(),)], "payload binary")
    r = acct_to_canonical(decode_acct_records(df), hostname="h9").collect()[0]
    assert r.appname == "accounting" and (r.facility, r.severity) == (1, 6)
    assert r.procid == "4242" and r.message == "ls"
    props = json.loads(r.properties_json)
    acc = props["accounting"]
    assert acc["pid_pid"] == "4242" and acc["uid"] == "1000"
    assert acc["flags"] == "forked" and acc["user_ns"] == "512000000000"
    assert props["skewer"]["client"] == "h9"
