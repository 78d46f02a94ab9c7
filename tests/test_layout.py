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
