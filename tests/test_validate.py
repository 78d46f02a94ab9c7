"""Data-contract validation tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from skewer_spark.operators.validate import validation_report, violating_rows


@pytest.fixture(scope="module")
def table(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", -5.0),      # violates value >= 0
            (3, None, 3.0),      # violates cat non-null AND cat-in-set (null)
            (3, "a", 7.0),       # duplicate id
            (4, "z", 1.0),       # violates cat in (a, b)
        ],
        "id int, cat string, value double",
    )


def _rules():
    # built lazily: Column construction needs an active session
    return [
        ("value_nonneg", F.col("value") >= 0),
        ("cat_not_null", F.col("cat").isNotNull()),
        ("cat_in_set", F.col("cat").isin("a", "b")),
    ]


def test_validation_report(spark, table):
    rep = {
        r["rule"]: r
        for r in validation_report(
            table, _rules(), unique_cols=[["id"]]
        ).collect()
    }
    assert all(r["n_rows"] == 5 for r in rep.values())
    assert rep["value_nonneg"]["n_violations"] == 1
    assert rep["cat_not_null"]["n_violations"] == 1
    # NULL cat: isin -> NULL -> fail-closed violation, plus 'z'
    assert rep["cat_in_set"]["n_violations"] == 2
    assert rep["unique:id"]["n_violations"] == 1
    assert rep["value_nonneg"]["frac_violated"] == 0.2
    assert not rep["cat_in_set"]["passed"]
    passed_rep = validation_report(
        table, [("id_positive", F.col("id") > 0)]
    ).collect()[0]
    assert passed_rep["passed"]


def test_validation_single_scan_plan(spark, table):
    """All row rules ride ONE aggregate over ONE scan."""
    plan = (
        validation_report(table, _rules())
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ") == 1
    assert "Generate explode" in plan


def test_empty_ruleset_rejected(spark, table):
    with pytest.raises(ValueError, match="at least one rule"):
        validation_report(table)


def test_violating_rows(spark, table):
    rows = violating_rows(table, _rules()).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault((r["id"], r["cat"]), set()).update(r["violated"])
    assert by_id[(2, "b")] == {"value_nonneg"}
    assert by_id[(3, None)] == {"cat_not_null", "cat_in_set"}
    assert by_id[(4, "z")] == {"cat_in_set"}
    assert (1, "a") not in by_id and (3, "a") not in by_id


def test_approx_unique_mode(spark, table):
    rep = {
        r["rule"]: r
        for r in validation_report(
            table, unique_cols=[["id"]], approx=True
        ).collect()
    }
    # HLL at this cardinality is exact; plan must be Expand-free
    assert rep["unique:id"]["n_violations"] == 1
    plan = (
        validation_report(table, unique_cols=[["id"]], approx=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan
