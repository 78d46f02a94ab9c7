"""Template mining: masking, grouping, per-position agreement, and the
broadcast assignment join — checked against hand-computed templates."""

from __future__ import annotations

from pyspark.sql import functions as F

from skewer_spark.operators.templates import (
    assign_templates,
    mask_variables,
    mine_templates,
)


def test_mask_variables(spark):
    df = spark.createDataFrame(
        [("conn from 10.0.0.1:8080 id 0xDEADBEEF took 250 ms",)],
        "text string",
    )
    out = df.select(mask_variables(F.col("text")).alias("m")).collect()
    assert out[0].m == "conn from <*>:<*> id <*> took <*> ms"


def _fixture_lines():
    # two structural families + one singleton
    a = [
        f"sshd accepted connection from 10.0.0.{i} port {2000 + i}"
        for i in range(4)
    ]
    b = [f"kernel oom killed pid {100 + i} score {i}" for i in range(3)]
    c = ["standalone boot complete"]
    return a + b + c


def test_mine_templates(spark):
    lines = _fixture_lines()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lines)], "line_id int, text string"
    )
    got = {
        r.template: (r.n_tokens, r.n_lines)
        for r in mine_templates(df).collect()
    }
    assert got == {
        "sshd accepted connection from <*> port <*>": (7, 4),
        "kernel oom killed pid <*> score <*>": (7, 3),
        "standalone boot complete": (3, 1),
    }


def test_same_length_groups_split_on_first_token(spark):
    # both families are 7 tokens long — the first token separates them
    lines = _fixture_lines()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lines)], "line_id int, text string"
    )
    tmpl = mine_templates(df).collect()
    sevens = [r for r in tmpl if r.n_tokens == 7]
    assert len(sevens) == 2
    firsts = {r.template.split()[0] for r in sevens}
    assert firsts == {"sshd", "kernel"}


def test_position_disagreement_wildcards(spark):
    # same length, same first token, one differing position
    df = spark.createDataFrame(
        [
            (0, "app started on port 80"),
            (1, "app stopped on port 80"),
        ],
        "line_id int, text string",
    )
    [r] = mine_templates(df).collect()
    assert r.template == "app <*> on port <*>"
    assert r.n_lines == 2


def test_assign_templates_roundtrip(spark):
    lines = _fixture_lines() + ["", "   "]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lines)], "line_id int, text string"
    )
    rows = {r.line_id: r for r in assign_templates(df).collect()}
    assert len(rows) == len(lines)
    for i, line in enumerate(lines):
        if not line.strip():
            assert rows[i].template is None
        elif line.startswith("sshd"):
            assert rows[i].template == (
                "sshd accepted connection from <*> port <*>"
            )
        elif line.startswith("kernel"):
            assert rows[i].template == "kernel oom killed pid <*> score <*>"
        else:
            assert rows[i].template == "standalone boot complete"
    # template_id is md5(template) — engine-stable
    import hashlib

    r = rows[0]
    assert r.template_id == hashlib.md5(r.template.encode()).hexdigest()
