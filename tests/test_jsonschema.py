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
