"""infer_json_schema / json_schema_drift: taxonomy, nesting, drift."""

from __future__ import annotations

import pytest

from skewer_spark.operators.jsonschema import (
    infer_json_schema,
    json_schema_drift,
)


@pytest.fixture(scope="module")
def bags(spark):
    rows = [
        ('{"k":1,"tags":["a"],"meta":{"u":7,"src":"web"}}',),
        ('{"k":"one","flag":true}',),
        ('{"k":2,"score":1.5,"meta":{"u":null,"deep":{"x":1}}}',),
        ('{"k":',),  # malformed
        (None,),  # no payload — excluded entirely
        ("[1,2]",),  # valid JSON, non-object root
    ]
    return spark.createDataFrame(rows, "j string")


def _hist(df):
    return {(r.path, r.vtype): (r.n, r.frac) for r in df.collect()}


def test_schema_histogram(bags):
    h = _hist(infer_json_schema(bags, "j", max_depth=2))
    # 5 non-null rows are the frac denominator
    assert h[("$", "object")] == (3, 0.6)
    assert h[("$", "malformed")] == (1, 0.2)
    assert h[("$", "array")] == (1, 0.2)
    # type drift on the same path is two rows
    assert h[("$.k", "int")] == (2, 0.4)
    assert h[("$.k", "string")] == (1, 0.2)
    # full taxonomy exercised
    assert h[("$.flag", "bool")][0] == 1
    assert h[("$.score", "float")][0] == 1
    assert h[("$.tags", "array")][0] == 1
    assert h[("$.meta", "object")][0] == 2
    assert h[("$.meta.u", "null")][0] == 1
    assert h[("$.meta.u", "int")][0] == 1
    assert h[("$.meta.src", "string")][0] == 1
    # depth-2 sees the nested object itself but not its members
    assert h[("$.meta.deep", "object")][0] == 1
    assert not any(p.startswith("$.meta.deep.") for p, _ in h)


def test_depth_bound(bags):
    h1 = _hist(infer_json_schema(bags, "j", max_depth=1))
    assert ("$.meta", "object") in h1
    assert not any(p.startswith("$.meta.") for p, _ in h1)
    h3 = _hist(infer_json_schema(bags, "j", max_depth=3))
    assert ("$.meta.deep.x", "int") in h3
    with pytest.raises(ValueError):
        infer_json_schema(bags, "j", max_depth=0)


def test_drift(bags, spark):
    old = infer_json_schema(bags, "j")
    # new producer: k became string everywhere, score gone, ver added
    new_rows = [('{"k":"9","flag":true,"ver":2}',)] * 4
    new = infer_json_schema(
        spark.createDataFrame(new_rows, "j string"), "j"
    )
    d = {(r.path, r.vtype): r.status for r in json_schema_drift(old, new).collect()}
    assert d[("$.ver", "int")] == "added"
    assert d[("$.k", "int")] == "removed"
    assert d[("$.score", "float")] == "removed"
    assert d[("$.k", "string")] == "shifted"
    assert d[("$.flag", "bool")] == "shifted"


def test_randomized_docs_match_python_reference(spark):
    """Seeded random JSON corpus: the VARIANT-based histogram must
    equal a pure-Python (json.loads) per-path type census, including
    numeric edge cases (big ints, exponent floats, integral floats)."""
    import json
    import random

    rng = random.Random(41)

    def rand_value(depth):
        kinds = ["int", "float", "str", "bool", "null", "bigint", "exp"]
        if depth > 0:
            kinds += ["obj", "arr", "obj"]
        k = rng.choice(kinds)
        if k == "int":
            return rng.randint(-1000, 1000)
        if k == "bigint":
            return rng.choice(
                [2**63 - 1, -(2**63), 2**64 + 7, 10**25]
            )
        if k == "float":
            return rng.choice([1.5, -0.25, 5.0, 3.141592653589793])
        if k == "exp":
            return float(rng.choice(["1e3", "2.5e-4", "1e30"]))
        if k == "str":
            return rng.choice(["x", "42", "true", ""])
        if k == "bool":
            return rng.random() < 0.5
        if k == "null":
            return None
        if k == "arr":
            return [rand_value(0) for _ in range(rng.randint(0, 3))]
        return {
            f"k{i}": rand_value(depth - 1)
            for i in range(rng.randint(0, 4))
        }

    docs = [
        {f"f{i}": rand_value(2) for i in range(rng.randint(1, 5))}
        for _ in range(120)
    ]

    def py_type(v):
        if isinstance(v, bool):
            return "bool"
        if v is None:
            return "null"
        if isinstance(v, int):
            return "int"
        if isinstance(v, float):
            # variant canonicalizes by VALUE: integral non-exponent
            # spellings ("5.0", "1000.0") land in DECIMAL(p,0) -> int;
            # exponent forms ("1e+30") stay DOUBLE -> float
            if v.is_integer() and "e" not in json.dumps(v):
                return "int"
            return "float"
        if isinstance(v, str):
            return "string"
        if isinstance(v, list):
            return "array"
        return "object"

    expected: dict[tuple[str, str], int] = {}

    def walk(v, path, depth):
        expected[(path, py_type(v))] = (
            expected.get((path, py_type(v)), 0) + 1
        )
        if isinstance(v, dict) and depth > 0:
            for k, sub in v.items():
                walk(sub, f"{path}.{k}", depth - 1)

    for d in docs:
        walk(d, "$", 2)

    df = spark.createDataFrame([(json.dumps(d),) for d in docs], "j string")
    got = {
        (r.path, r.vtype): r.n
        for r in infer_json_schema(df, "j", max_depth=2).collect()
    }
    assert got == expected


def test_drift_same_vs_shifted_and_sentinel_key(spark):
    from skewer_spark.operators.jsonschema import infer_json_schema

    stable = spark.createDataFrame(
        [('{"a":1,"b":"x"}',), ('{"a":2}',)], "j string"
    )
    moved = spark.createDataFrame(
        [('{"a":3,"b":"y"}',), ('{"b":"z"}',)], "j string"
    )
    d = {
        (r.path, r.vtype): r.status
        for r in json_schema_drift(
            infer_json_schema(stable, "j"), infer_json_schema(moved, "j")
        ).collect()
    }
    assert d[("$", "object")] == "same"  # 1.0 == 1.0
    assert d[("$.a", "int")] == "shifted"  # 1.0 -> 0.5
    assert d[("$.b", "string")] == "shifted"  # 0.5 -> 1.0
    # a key containing the \x01 sentinel must not truncate the path
    weird = spark.createDataFrame([('{"a\\u0001b":1}',)], "j string")
    got = {
        (r.path, r.vtype) for r in infer_json_schema(weird, "j").collect()
    }
    assert ("$.ab", "int") in got  # sentinel stripped, not truncated
