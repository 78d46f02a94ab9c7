"""Windowed rate anomaly detection (operators/anomaly.py).

Fixtures plant a spike, an outage (gap hour → zero-filled window), a
constant-baseline spike (MAD=0 → meanAD fallback), and a perfectly
flat series; expected modified z-scores are recomputed independently
in pure Python.
"""

from __future__ import annotations

import datetime as dt

from skewer_spark.operators.anomaly import rate_anomalies, windowed_counts

_BASE = dt.datetime(2024, 3, 1, 0, 0, 0)

# per-key counts by hour index; None = no events that hour (gap)
_SERIES = {
    # varying baseline, hour 7 spike, hour 10 outage
    "a": [8, 12, 9, 11, 10, 8, 12, 100, 9, 11, None, 10],
    # constant baseline → MAD = 0 → meanAD fallback; hour 5 spike
    "c": [5, 5, 5, 5, 5, 50, 5, 5, 5, 5],
    # perfectly flat → all z = 0
    "b": [7, 7, 7, 7, 7],
}


def _events(spark):
    rows = []
    for k, series in _SERIES.items():
        for h, n in enumerate(series):
            for i in range(n or 0):
                rows.append((k, _BASE + dt.timedelta(hours=h, seconds=10 * i)))
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


def _py_z(series: list[int | None]) -> list[float]:
    xs = [n if n is not None else 0 for n in series]
    s = sorted(xs)
    m = len(s)
    med = (s[(m - 1) // 2] + s[m // 2]) / 2
    ads = sorted(abs(x - med) for x in xs)
    mad = (ads[(m - 1) // 2] + ads[m // 2]) / 2
    mean_ad = sum(abs(x - med) for x in xs) / m
    out = []
    for x in xs:
        if mad > 0:
            z = 0.6745 * (x - med) / mad
        elif mean_ad > 0:
            z = (x - med) / (1.253314 * mean_ad)
        else:
            z = 0.0
        out.append(round(z, 6))
    return out


def test_windowed_counts_fills_gap_hours(spark):
    c = {
        (r.k, r.w): r.n_events
        for r in windowed_counts(_events(spark)).collect()
    }
    # the gap hour exists with count 0
    assert c[("a", _BASE + dt.timedelta(hours=10))] == 0
    assert c[("a", _BASE + dt.timedelta(hours=7))] == 100
    # per-key spans are independent: "b" has exactly its 5 hours
    assert sum(1 for (k, _) in c if k == "b") == 5
    assert sum(1 for (k, _) in c if k == "a") == 12


def test_no_fill_gaps_drops_empty_windows(spark):
    c = windowed_counts(_events(spark), fill_gaps=False).collect()
    assert ("a", _BASE + dt.timedelta(hours=10)) not in {
        (r.k, r.w) for r in c
    }


def test_rate_anomalies_match_independent_zscores(spark):
    got = {
        (r.event_type, r.window_start): (r.n_events, r.z_score, r.is_anomaly)
        for r in rate_anomalies(_events(spark)).collect()
    }
    for k, series in _SERIES.items():
        want = _py_z(series)
        for h, z in enumerate(want):
            n, gz, flag = got[(k, _BASE + dt.timedelta(hours=h))]
            assert n == (series[h] or 0)
            assert abs(gz - z) < 1e-6, (k, h, gz, z)
            assert flag == (abs(z) > 3.5)


def test_spike_outage_and_fallback_flags(spark):
    flagged = {
        (r.event_type, r.window_start)
        for r in rate_anomalies(_events(spark)).collect()
        if r.is_anomaly
    }
    assert ("a", _BASE + dt.timedelta(hours=7)) in flagged   # spike
    assert ("a", _BASE + dt.timedelta(hours=10)) in flagged  # outage
    assert ("c", _BASE + dt.timedelta(hours=5)) in flagged   # meanAD path
    # flat series never flags; c's baseline hours never flag
    assert not any(k == "b" for (k, _) in flagged)
    assert len(flagged) == 3
