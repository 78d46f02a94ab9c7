"""profile_table: per-dtype extrema, nulls, distincts, single-scan plan."""

from __future__ import annotations

import datetime as dt

import pytest

from skewer_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (100, "b", 2.5, dt.datetime(2024, 1, 2, 3, 4, 5, 600000), True),
        (99, None, 0.125, dt.datetime(2024, 1, 1), False),
        (None, "a", None, None, None),
        (7, "a", -3.0, dt.datetime(2024, 2, 1), True),
    ]
    return spark.createDataFrame(
        rows, "i long, s string, d double, t timestamp, b boolean"
    )


def test_profile_values(frame):
    prof = {
        r.column: r for r in profile_table(frame, exact_distinct=True).collect()
    }
    assert set(prof) == {"i", "s", "d", "t", "b"}
    assert all(prof[c].n_rows == 4 for c in prof)
    # numeric min/max are NUMERIC, not lexicographic
    assert (prof["i"].min_value, prof["i"].max_value) == ("7", "100")
    assert prof["i"].n_nulls == 1 and prof["i"].n_distinct == 3
    assert (prof["s"].min_value, prof["s"].max_value) == ("a", "b")
    assert prof["s"].n_distinct == 2
    assert (prof["d"].min_value, prof["d"].max_value) == (
        "-3.000000", "2.500000"
    )
    assert prof["t"].min_value == "2024-01-01 00:00:00.000000"
    assert prof["t"].max_value == "2024-02-01 00:00:00.000000"
    assert (prof["b"].min_value, prof["b"].max_value) == ("false", "true")


def test_profile_single_scan(frame):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        profile_table(frame).explain("formatted")
    plan = buf.getvalue()
    # one aggregate pass over the input: the explode-of-structs unpivot
    # runs inside the same plan, it must not re-scan the source k times
    # (each node prints twice — tree line + detail header — so count
    # numbered detail headers)
    import re

    assert len(re.findall(r"\(\d+\) Scan", plan)) == 1
    assert len(re.findall(r"\(\d+\) Generate", plan)) == 1


def test_unknown_column_raises(frame):
    with pytest.raises(ValueError):
        profile_table(frame, cols=["nope"])


def test_numeric_histogram(spark):
    from skewer_spark.operators.profile import numeric_histogram

    df = spark.createDataFrame([(float(i),) for i in range(100)], ["v"])
    out = {r["bin"]: r for r in numeric_histogram(df, "v", bins=10).collect()}
    # 0..99 over 10 bins of width 9.9: bin 0 holds 0..9.89 -> 10 values
    assert len(out) == 10
    assert sum(r["n"] for r in out.values()) == 100
    # max value (99.0 == hi) clamps into the last bin, not dropped
    assert out[9]["n"] >= 10
    assert abs(out[0]["bin_lo"] - 0.0) < 1e-9
    assert abs(out[9]["bin_hi"] - 99.0) < 1e-6
    assert abs(sum(r["frac"] for r in out.values()) - 1.0) < 1e-4


def test_numeric_histogram_explicit_bounds_and_clamp(spark):
    from skewer_spark.operators.profile import numeric_histogram

    df = spark.createDataFrame([(v,) for v in [-5.0, 0.5, 1.5, 99.0]], ["v"])
    out = {r["bin"]: r["n"] for r in
           numeric_histogram(df, "v", bins=2, lo=0.0, hi=2.0).collect()}
    # -5 clamps to bin 0; 99 clamps to bin 1
    assert out == {0: 2, 1: 2}


def test_numeric_histogram_degenerate_range(spark):
    import pytest as _pytest
    from skewer_spark.operators.profile import numeric_histogram

    df = spark.createDataFrame([(1.0,), (1.0,)], ["v"])
    with _pytest.raises(ValueError, match="degenerate"):
        numeric_histogram(df, "v")


def test_winsorize(spark):
    from skewer_spark.operators.profile import winsorize

    vals = [float(i) for i in range(1, 100)] + [10000.0]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    out = winsorize(df, "v", p_lo=0.05, p_hi=0.95).collect()
    clipped = [r for r in out if r["is_clipped"]]
    # the 10000 outlier must be clipped down
    big = [r for r in out if r["v"] == 10000.0][0]
    assert big["is_clipped"] and big["value_w"] < 100.0
    # interior values untouched
    mid = [r for r in out if r["v"] == 50.0][0]
    assert not mid["is_clipped"] and mid["value_w"] == 50.0
    assert 0 < len(clipped) < len(out)
