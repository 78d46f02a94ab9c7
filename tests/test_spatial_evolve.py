"""Unit tests: grid radius join, categorical entropy, schema
evolution reconcile."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from skewer_spark.operators.evolve import (
    reconcile_frames,
    unified_schema,
    widen_type,
)
from skewer_spark.operators.profile import category_entropy
from skewer_spark.operators.spatial import radius_counts, radius_pairs


def test_radius_pairs_exact_vs_brute_force(spark):
    # 200 deterministic points; grid join must equal brute force
    pts = [(i, (i * 37) % 100, (i * 61 + i * i) % 100) for i in range(200)]
    df = spark.createDataFrame(pts, ["pid", "x", "y"])
    r = 9
    got = {
        (row["id_a"], row["id_b"]): row["dist_sq"]
        for row in radius_pairs(df, "pid", "x", "y", r).collect()
    }
    want = {}
    for i, xi, yi in pts:
        for j, xj, yj in pts:
            if i < j and (xi - xj) ** 2 + (yi - yj) ** 2 <= r * r:
                want[(i, j)] = (xi - xj) ** 2 + (yi - yj) ** 2
    assert got == want and len(want) > 0


def test_radius_pairs_boundary_inclusive(spark):
    df = spark.createDataFrame(
        [(1, 0, 0), (2, 3, 4), (3, 0, 6)], ["pid", "x", "y"]
    )
    got = {(r["id_a"], r["id_b"]) for r in
           radius_pairs(df, "pid", "x", "y", 5).collect()}
    # dist(1,2)=5 exactly → included; dist(1,3)=6 → excluded;
    # dist(2,3)=sqrt(13) → included
    assert got == {(1, 2), (2, 3)}


def test_radius_counts_zero_fill(spark):
    df = spark.createDataFrame(
        [(1, 0, 0), (2, 1, 1), (3, 500, 500)], ["pid", "x", "y"]
    )
    got = {r["pid"]: r["n_neighbors"] for r in
           radius_counts(df, "pid", "x", "y", 5).collect()}
    assert got == {1: 1, 2: 1, 3: 0}


def test_radius_pairs_cell_cap_bounds_output(spark):
    # 50 coincident points: uncapped join output is 50·49/2 pairs;
    # cap=5 bounds it at |cell|·cap (pairs only involve the 5 lowest
    # ids as id_a) — and every point still pairs with a survivor
    df = spark.createDataFrame([(i, 7, 7) for i in range(50)], ["pid", "x", "y"])
    capped = radius_pairs(df, "pid", "x", "y", 5, cell_cap=5).collect()
    assert 0 < len(capped) < 50 * 49 // 2
    assert {r["id_a"] for r in capped} <= set(range(5))
    touched = {r["id_a"] for r in capped} | {r["id_b"] for r in capped}
    assert touched == set(range(50))


def test_category_entropy_values(spark):
    rows = (
        [("u", "a")] * 4 + [("u", "b")] * 4  # uniform over 2 → ln 2
        + [("v", "a")] * 5                   # single cat → 0, norm NULL
        + [("w", "a"), ("w", None)]          # NULL is a real level
    )
    df = spark.createDataFrame(rows, ["k", "cat"])
    got = {r["k"]: r for r in category_entropy(df, ["k"], "cat").collect()}
    assert got["u"]["entropy"] == pytest.approx(round(math.log(2), 6))
    assert got["u"]["norm_entropy"] == 1.0
    assert got["v"]["entropy"] == 0.0 and got["v"]["norm_entropy"] is None
    assert got["w"]["n_cats"] == 2
    assert got["w"]["entropy"] == pytest.approx(round(math.log(2), 6))


def test_widen_type_lattice():
    assert widen_type("int", "bigint") == "bigint"
    assert widen_type("int", "double") == "double"
    assert widen_type("float", "bigint") == "double"
    assert widen_type("bigint", "string") == "string"
    assert widen_type("boolean", "int") == "string"
    assert widen_type("date", "timestamp") == "timestamp"
    assert widen_type("timestamp", "timestamp_ntz") == "string"
    assert widen_type("decimal(10,2)", "bigint") == "double"
    with pytest.raises(ValueError):
        widen_type("array<int>", "map<string,int>")


def test_reconcile_frames_union_and_null_fill(spark):
    a = spark.createDataFrame([(1, 10, "x")], ["id", "m", "note"])
    b = spark.createDataFrame([(2, 3.5)], ["id", "m"]).withColumn(
        "origin", F.lit("b")
    )
    out = reconcile_frames([a, b])
    assert [f.simpleString() for f in out.schema.fields] == [
        "id:bigint", "m:double", "note:string", "origin:string",
    ]
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["m"] == 10.0 and rows[1]["origin"] is None
    assert rows[2]["m"] == 3.5 and rows[2]["note"] is None


def test_unified_schema_first_seen_order(spark):
    a = spark.createDataFrame([(1, "x")], ["id", "note"])
    b = spark.createDataFrame([("y", 2)], ["extra", "id"])
    assert [n for n, _ in unified_schema([a.schema, b.schema])] == [
        "id", "note", "extra",
    ]
