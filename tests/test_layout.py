"""Z-order layout: Morton correctness + the file-pruning locality win."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F


def _ref_morton(vals: list[int], bits: int) -> int:
    z = 0
    for ci, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * len(vals) + ci)
    return z


def test_interleave_matches_reference(spark):
    from skewer_spark.operators.layout import interleave_bits

    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 11)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn(
            "z", interleave_bits(["x", "y"], bits=6)
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _ref_morton([x, y], 6)
    # 3-column interleave too
    df3 = spark.createDataFrame(
        [(1, 2, 3), (7, 0, 5)], "a long, b long, c long"
    )
    got3 = df3.withColumn(
        "z", interleave_bits(["a", "b", "c"], bits=4)
    ).collect()
    for r in got3:
        assert r.z == _ref_morton([r.a, r.b, r.c], 4)


def test_interleave_guards(spark):
    from skewer_spark.operators.layout import interleave_bits

    with pytest.raises(ValueError, match=">= 2"):
        interleave_bits(["x"])
    with pytest.raises(ValueError, match="overflows"):
        interleave_bits(["a", "b", "c", "d"], bits=16)


def test_zorder_key_normalization(spark):
    # zkey is invariant under affine rescaling of the inputs, and a
    # constant column contributes nothing
    from skewer_spark.operators.layout import zorder_key

    rows = [(float(x), float(y)) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x double, y double")
    k1 = {
        (r.x, r.y): r.zkey
        for r in zorder_key(df, ["x", "y"], bits=5).collect()
    }
    scaled = df.select(
        (F.col("x") * 100 - 7).alias("x"), (F.col("y") * 0.25).alias("y")
    )
    k2 = {
        (round(r.x / 100 + 0.07) if False else r.x, r.y): r.zkey
        for r in zorder_key(scaled, ["x", "y"], bits=5).collect()
    }
    assert sorted(k1.values()) == sorted(k2.values())
    const = df.withColumn("y", F.lit(3.0))
    kc = zorder_key(const, ["x", "y"], bits=5).collect()
    assert all(r.zkey == _ref_morton([int(r.x), 0], 5) for r in kc)


def test_zorder_pruning_beats_linear_sort(spark, tmp_path):
    # 64x64 grid -> 16 files.  A filter on y alone must open every file
    # of the x-sorted layout but only a stripe of the z-ordered one.
    from skewer_spark.operators.layout import zorder_repartition

    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")

    zdir = str(tmp_path / "zorder")
    ldir = str(tmp_path / "linear")
    zorder_repartition(df, ["x", "y"], n_files=16, bits=6).drop(
        "zkey"
    ).write.parquet(zdir)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(
        ldir
    )

    def files_touched(path, cond):
        return (
            spark.read.parquet(path)
            .filter(cond)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    cond_y = (F.col("y") >= 8) & (F.col("y") < 16)      # 1/8 of y-range
    box = cond_y & (F.col("x") >= 8) & (F.col("x") < 16)
    lin_y = files_touched(ldir, cond_y)
    z_y = files_touched(zdir, cond_y)
    z_box = files_touched(zdir, box)
    assert lin_y == 16            # linear layout: y-filter opens all
    assert z_y <= 8               # z-order: a y-stripe skips half+
    assert z_box <= 2             # a 1/64 box lives in a corner
    # row-level results identical regardless of layout
    assert (
        spark.read.parquet(zdir).filter(box).count()
        == spark.read.parquet(ldir).filter(box).count()
        == 64
    )


# ---------------------------------------------------------------------------
# bucketed-table layout: the shuffle-elimination contract
# ---------------------------------------------------------------------------

def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _bucketed_fixture(spark, tmp_path):
    from skewer_spark.operators.layout import write_bucketed

    left = spark.createDataFrame(
        [(i % 37, i, f"conv{i % 37}") for i in range(400)],
        "k int, v long, tag string",
    )
    right = spark.createDataFrame(
        [(k, k * 10) for k in range(37)], "k int, w long"
    )
    write_bucketed(left, "bkt_left", ["k"], 4, path=str(tmp_path / "l"))
    write_bucketed(right, "bkt_right", ["k"], 4, path=str(tmp_path / "r"))
    return left, right


def test_cobucketed_join_has_no_exchange(spark, tmp_path):
    left, right = _bucketed_fixture(spark, tmp_path)
    j = spark.table("bkt_left").hint("merge").join(spark.table("bkt_right"), "k")
    plan = _plan(j)
    # both scans already satisfy the join's hash clustering: no shuffle
    # on EITHER side, and the per-bucket sortBy removes the Sort too
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    # result parity with the plain (shuffled) join
    got = sorted((r.k, r.v, r.w) for r in j.select("k", "v", "w").collect())
    want = sorted(
        (r.k, r.v, r.w)
        for r in left.join(right, "k").select("k", "v", "w").collect()
    )
    assert got == want


def test_bucketed_groupby_has_no_exchange(spark, tmp_path):
    _bucketed_fixture(spark, tmp_path)
    agg = spark.table("bkt_left").groupBy("k").agg(F.sum("v").alias("s"))
    plan = _plan(agg)
    assert "Exchange" not in plan
    assert "HashAggregate" in plan


def test_bucket_pruning_on_equality_filter(spark, tmp_path):
    _bucketed_fixture(spark, tmp_path)
    # DisableUnnecessaryBucketedScan would demote a filter-only query's
    # bucketed scan; pin it on for the pruning assertion
    old = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        q = spark.table("bkt_left").filter(F.col("k") == 7)
        plan = _plan(q)
        assert "SelectedBucketsCount: 1 out of 4" in plan
        assert q.count() == sum(1 for i in range(400) if i % 37 == 7)
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", old
        )


def test_write_bucketed_one_file_per_bucket(spark, tmp_path):
    import glob

    _bucketed_fixture(spark, tmp_path)
    files = [
        f
        for f in glob.glob(str(tmp_path / "l" / "*"))
        if f.endswith(".parquet")
    ]
    # the pre-repartition makes each task own exactly one bucket: 4
    # buckets -> exactly 4 data files (not n_tasks x n_buckets slivers)
    assert len(files) == 4
