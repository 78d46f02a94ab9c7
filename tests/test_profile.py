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
