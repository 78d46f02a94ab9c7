"""k-anonymity / l-diversity audit + annotation aggregation tests."""

from __future__ import annotations

from collections import Counter

import pytest

from pyspark.sql import functions as F

from skewer_spark.operators.labels import (
    annotator_agreement,
    fleiss_kappa_inputs,
    majority_labels,
)
from skewer_spark.operators.privacy import qi_group_audit, risk_summary


@pytest.fixture(scope="module")
def people(spark):
    rows = []
    # group A: 6 rows, 3 distinct diagnoses -> k(5) ok, l(2) ok
    for i in range(6):
        rows.append((i, "02139", 1980, ["flu", "cold", "ok"][i % 3]))
    # group B: 2 rows, same diagnosis -> sub-k AND homogeneous
    rows += [(10, "94105", 1990, "flu"), (11, "94105", 1990, "flu")]
    # group C: 5 rows, one diagnosis -> k ok, NOT l-diverse
    for i in range(20, 25):
        rows.append((i, "10001", 1975, "covid"))
    # group D: NULL zip is its own QI value, 1 row
    rows.append((30, None, 1980, "flu"))
    return spark.createDataFrame(
        rows, ["person_id", "zip", "birth_year", "diagnosis"]
    )


def test_qi_group_audit(spark, people):
    audit = qi_group_audit(
        people, ["zip", "birth_year"], "diagnosis", k=5, l=2
    )
    g = {(r["zip"], r["birth_year"]): r for r in audit.collect()}
    a = g[("02139", 1980)]
    assert a["group_size"] == 6 and a["k_anonymous"] and a["l_diverse"]
    b = g[("94105", 1990)]
    assert b["group_size"] == 2 and not b["k_anonymous"] and not b["l_diverse"]
    c = g[("10001", 1975)]
    assert c["group_size"] == 5 and c["k_anonymous"] and not c["l_diverse"]
    d = g[(None, 1980)]
    assert d["group_size"] == 1 and not d["k_anonymous"]


def test_risk_summary(spark, people):
    audit = qi_group_audit(
        people, ["zip", "birth_year"], "diagnosis", k=5, l=2
    )
    s = risk_summary(audit).collect()[0]
    assert s["n_rows"] == 14 and s["n_groups"] == 4
    assert s["min_group_size"] == 1
    assert s["rows_at_risk"] == 3  # group B (2) + group D (1)
    assert s["groups_at_risk"] == 2
    assert s["rows_not_diverse"] == 5  # group C only (B already at-risk)


def test_qi_audit_without_sensitive(spark, people):
    audit = qi_group_audit(people, ["zip"], None, k=3)
    row = {r["zip"]: r for r in audit.collect()}["02139"]
    assert row["group_size"] == 6 and row["k_anonymous"]
    assert row["n_sensitive"] is None and row["l_diverse"] is None


def test_qi_audit_plan_shape(spark, people):
    # with a sensitive column: the canonical exact-distinct pair of
    # partial-aggregable exchanges — (QI, sensitive) dedup then QI —
    # and the payload column (person_id) pruned before the shuffle
    plan = (
        qi_group_audit(people, ["zip", "birth_year"], "diagnosis")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 2
    assert "partial_count" in plan
    assert "person_id" not in plan.split("Exchange", 1)[0]
    # pure k-anonymity: single exchange
    plan_k = (
        qi_group_audit(people, ["zip", "birth_year"], None)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan_k.count("Exchange") == 1


# ---------------------------------------------------------------------------
# annotation aggregation
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def votes(spark):
    # item 1: clear majority; item 2: 2-2 tie (break -> 'a');
    # item 3: unanimous
    rows = [
        (1, "ann1", "a"), (1, "ann2", "a"), (1, "ann3", "b"), (1, "ann4", "a"),
        (2, "ann1", "b"), (2, "ann2", "a"), (2, "ann3", "b"), (2, "ann4", "a"),
        (3, "ann1", "c"), (3, "ann2", "c"), (3, "ann3", "c"), (3, "ann4", "c"),
    ]
    return spark.createDataFrame(rows, ["item_id", "annotator_id", "label"])


def test_majority_labels(spark, votes):
    m = {r["item"]: r for r in majority_labels(votes).collect()}
    assert m[1]["majority_label"] == "a" and m[1]["majority_n"] == 3
    assert m[1]["agreement"] == 0.75 and m[1]["n_labels"] == 2
    # deterministic tie-break: smallest label wins
    assert m[2]["majority_label"] == "a" and m[2]["agreement"] == 0.5
    assert m[3]["majority_label"] == "c" and m[3]["agreement"] == 1.0


def test_annotator_agreement(spark, votes):
    acc = {r["annotator"]: r for r in annotator_agreement(votes).collect()}
    # ann2/ann4 matched all 3 majorities; ann1 missed item2 ('b' vs 'a'),
    # ann3 missed items 1 and 2
    assert acc["ann2"]["accuracy"] == 1.0
    assert acc["ann4"]["accuracy"] == 1.0
    assert acc["ann1"]["n_match"] == 2
    assert acc["ann3"]["n_match"] == 1
    assert all(r["n_votes"] == 3 for r in acc.values())


def test_fleiss_kappa_vs_reference(spark, votes):
    row = fleiss_kappa_inputs(votes).collect()[0]
    # independent per-item reference
    items = {
        1: ["a", "a", "b", "a"],
        2: ["b", "a", "b", "a"],
        3: ["c", "c", "c", "c"],
    }
    n = 4
    n_items = len(items)
    p_o_ref = sum(
        sum(c * (c - 1) for c in Counter(ls).values()) / (n * (n - 1))
        for ls in items.values()
    ) / n_items
    all_votes = Counter(v for ls in items.values() for v in ls)
    p_e_ref = sum((c / (n_items * n)) ** 2 for c in all_votes.values())
    assert abs(row["p_o"] - p_o_ref) < 1e-6
    assert abs(row["p_e"] - p_e_ref) < 1e-6
    assert row["n_items"] == 3 and row["n_raters"] == 4


def test_fleiss_kappa_rejects_single_rating(spark):
    one = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y")], ["item_id", "annotator_id", "label"]
    )
    with pytest.raises(ValueError, match=">= 2 ratings"):
        fleiss_kappa_inputs(one)


def test_fleiss_kappa_rejects_ragged(spark, votes):
    ragged = votes.filter(
        ~((F.col("item_id") == 3) & (F.col("annotator_id") == "ann4"))
    )
    with pytest.raises(ValueError, match="same number of ratings"):
        fleiss_kappa_inputs(ragged)
