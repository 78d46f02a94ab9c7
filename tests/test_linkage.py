"""Entity-resolution (record linkage) tests."""

from __future__ import annotations

import pytest

from skewer_spark.operators.linkage import blocked_candidates, link_records


@pytest.fixture(scope="module")
def feeds(spark):
    left = spark.createDataFrame(
        [
            (1, "John A Smith", "NYC", 1980),
            (2, "Alice Jones", "SF", 1990),
            (3, "Bob Corp Inc", "LA", 2000),
        ],
        ["rec_id", "name", "city", "year"],
    )
    right = spark.createDataFrame(
        [
            (10, "Smith, John A.", "NYC", 1980),   # exact entity, reformatted
            (11, "alice JONES", "SF", 1991),        # name match, year off by 1
            (12, "Charlie Brown", "LA", 2000),      # no shared name token
            (13, "Bob Different", "LA", 1999),      # weak partial
        ],
        ["rec_id", "name", "city", "year"],
    )
    return left, right


def test_link_records_verdicts(spark, feeds):
    left, right = feeds
    out = {
        (r["left_id"], r["right_id"]): r
        for r in link_records(
            left, right, exact_cols=["city", "year"]
        ).collect()
    }
    full = out[(1, 10)]
    assert full["name_jaccard"] == 1.0 and full["n_exact"] == 2
    assert full["score"] == 1.0 and full["verdict"] == "match"
    near = out[(2, 11)]
    assert near["name_jaccard"] == 1.0 and near["n_exact"] == 1
    assert near["score"] == 0.75 and near["verdict"] == "match"
    weak = out[(3, 13)]
    assert weak["name_jaccard"] == 0.25 and weak["n_exact"] == 1
    assert weak["verdict"] == "non_match"
    # no shared token -> never a candidate
    assert not any(r == 12 for (_, r) in out)


def test_missing_field_contributes_zero(spark):
    schema = "rec_id int, name string, city string"
    left = spark.createDataFrame([(1, "jane doe", None)], schema)
    right = spark.createDataFrame([(2, "jane doe", None)], schema)
    row = link_records(left, right, exact_cols=["city"]).collect()[0]
    # NULL == NULL does NOT count as agreement (missing-at-random)
    assert row["n_exact"] == 0
    assert row["score"] == round(2.0 / 3.0, 6)


def test_stop_token_cap_excludes_hot_tokens(spark):
    # 'acme' appears in every left record -> above df cap, never blocks;
    # the rare token still blocks its pair
    left = spark.createDataFrame(
        [(i, f"acme widget{i}") for i in range(10)], ["rec_id", "name"]
    )
    right = spark.createDataFrame(
        [(100, "acme something"), (101, "widget3 shop")], ["rec_id", "name"]
    )
    cands = blocked_candidates(left, right, max_token_df=5).collect()
    pairs = {(c["left_id"], c["right_id"]) for c in cands}
    assert (3, 101) in pairs          # via rare token 'widget3'
    assert all(r != 100 for (_, r) in pairs)  # 'acme' blocked nothing


def test_block_join_fixed_width_exchange(spark, feeds):
    left, right = feeds
    plan = (
        blocked_candidates(left, right)
        ._jdf.queryExecution().executedPlan().toString()
    )
    n = spark.sparkContext.defaultParallelism
    assert "hashpartitioning(tok" in plan
    assert f", {n}), REPARTITION_BY_NUM" in plan
