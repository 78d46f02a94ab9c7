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

    # VERDICT r02 #10: the dropped group is ACCOUNTED, not silent —
    # one audit row per incomplete msg_id with received/expected counts
    # (the duplicated chunk must not count twice)
    from skewer_spark.sources.binary import gelf_incomplete_groups
    inc = gelf_incomplete_groups(df).collect()
    assert len(inc) == 1
    assert inc[0].msg_id == b"BBBBBBBB".hex().upper()
    assert (inc[0].n_received, inc[0].total_expected) == (2, 4)


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


# ---------------------------------------------------------------------------
# collectd binary network protocol
# ---------------------------------------------------------------------------

def _cd_str(ptype: int, s: str) -> bytes:
    b = s.encode() + b"\x00"
    return ptype.to_bytes(2, "big") + (4 + len(b)).to_bytes(2, "big") + b


def _cd_num(ptype: int, v: int) -> bytes:
    return ptype.to_bytes(2, "big") + (12).to_bytes(2, "big") + v.to_bytes(8, "big")


def _cd_values(pairs) -> bytes:
    import struct
    n = len(pairs)
    body = n.to_bytes(2, "big") + bytes(k for k, _ in pairs)
    for k, v in pairs:
        if k == 1:
            body += struct.pack("<d", v)
        elif k == 2:
            body += struct.pack(">q", int(v))
        else:
            body += struct.pack(">Q", int(v))
    return (6).to_bytes(2, "big") + (4 + len(body)).to_bytes(2, "big") + body


def test_collectd_packet_walker():
    from skewer_spark.sources.binary import parse_collectd_packet

    pkt = (
        _cd_str(0, "h1")
        + _cd_num(8, 1704067200 << 30)        # high-res time
        + _cd_str(2, "load") + _cd_str(4, "load")
        + _cd_values([(1, 0.5), (1, 0.25), (1, 1.75)])
        + _cd_str(2, "interface") + _cd_str(3, "eth0")
        + _cd_str(4, "if_octets")
        + _cd_values([(2, 100), (2, 200)])
        + _cd_str(4, "mystery")                # unknown type, 1 counter
        + _cd_values([(0, 42)])
    )
    msgs = parse_collectd_packet(pkt)
    assert len(msgs) == 3
    load, ifo, myst = msgs
    # types.db names + identifier state accumulation
    assert load["hostname"] == "h1" and load["plugin"] == "load"
    assert load["time_reported_num"] == 1704067200 * 10**9
    import json
    p = json.loads(load["properties_json"])
    assert p["gauge"] == {"shortterm": "0.500", "midterm": "0.250",
                          "longterm": "1.750"}
    m = json.loads(load["message"])
    assert m["dsnames"] == ["shortterm", "midterm", "longterm"]
    assert m["values"] == [0.5, 0.25, 1.75]
    # derive + plugin_instance carries over
    assert json.loads(ifo["properties_json"])["derive"] == {
        "rx": "100", "tx": "200"}
    assert ifo["plugin_instance"] == "eth0"
    # counter: in message JSON but NOT in properties (reference parity)
    pm = json.loads(myst["properties_json"])
    assert "gauge" not in pm and "derive" not in pm
    assert json.loads(myst["message"])["values"] == [42]
    assert json.loads(myst["message"])["dsnames"] == ["value"]
    # truncated packet stops cleanly at the malformed part
    assert len(parse_collectd_packet(pkt[: len(pkt) - 3])) == 2
    assert parse_collectd_packet(b"") == []
    assert parse_collectd_packet(b"\x00\x00\x00") == []


def test_collectd_spark_decode(spark):
    from skewer_spark.sources.binary import decode_collectd

    pkt1 = (
        _cd_str(0, "hostA") + _cd_num(1, 1704067200)
        + _cd_str(2, "load") + _cd_str(4, "load")
        + _cd_values([(1, 1.0), (1, 2.0), (1, 3.0)])
        + _cd_values([(1, 4.0), (1, 5.0), (1, 6.0)])
    )
    df = spark.createDataFrame(
        [(1, pkt1), (2, b"junk")],
        "id int, payload binary",
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"])
                 .to_timestamp(__import__("pyspark.sql.functions",
                                          fromlist=["F"]).lit("2024-06-01 00:00:00")))
    out = decode_collectd(df).collect()
    # two ValueLists from pkt1; the junk frame yields nothing
    assert len(out) == 2
    r = out[0]
    assert r.priority == 14 and r.appname == "collectd" and r.procid == "load"
    assert r.hostname == "hostA"
    assert str(r.time_reported).startswith("2024-01-01 00:00:00")
    assert str(r.time_generated).startswith("2024-06-01")
