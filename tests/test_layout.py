"""Z-order clustered writes: the layout must actually skip — a box
filter on EITHER z-column touches far fewer files than a hash layout —
and the data must round-trip unchanged."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from public_transit_data_platform_sql_nosql_spark.jobs.layout import (
    write_zordered,
    zorder_key,
)


@pytest.fixture(scope="module")
def grid(spark):
    # 64x64 integer grid, one row per cell, shuffled arrival order
    rows = [(x * 7919 % 64, y * 104729 % 64, x * 64 + y)
            for x in range(64) for y in range(64)]
    return spark.createDataFrame(rows, "a long, b long, v long")


def _files_touched(spark, path, pred):
    df = spark.read.parquet(path).withColumn(
        "_f", F.input_file_name())
    total = df.select("_f").distinct().count()
    hit = df.filter(pred).select("_f").distinct().count()
    return hit, total


def test_zorder_skips_on_both_columns(spark, grid, tmp_path):
    zp = str(tmp_path / "z")
    hp = str(tmp_path / "h")
    write_zordered(grid, zp, ["a", "b"], target_files=16)
    grid.repartition(16).write.parquet(hp)  # hash layout control

    for col in ("a", "b"):
        pred = (F.col(col) >= 10) & (F.col(col) < 18)  # 12.5% box
        zhit, ztot = _files_touched(spark, zp, pred)
        hhit, htot = _files_touched(spark, hp, pred)
        assert htot >= 16 and hhit == htot, \
            "hash layout must spread the box over every file"
        # the z-layout must concentrate the same box in a minority of
        # files on EITHER dimension (that's the whole point of morton
        # vs a plain sort, which would only skip on the leading column)
        assert zhit <= ztot // 2, (col, zhit, ztot)


def test_zorder_roundtrip_and_validation(spark, grid, tmp_path):
    p = str(tmp_path / "rt")
    stats = write_zordered(grid, p, ["a", "b"], target_files=8)
    assert stats["bounds"]["a"] == (0, 63)
    back = spark.read.parquet(p)
    assert back.count() == grid.count()
    assert back.agg(F.sum("v")).first()[0] == grid.agg(F.sum("v")).first()[0]
    assert set(back.columns) == {"a", "b", "v"}
    with pytest.raises(ValueError):
        write_zordered(grid, p, [])
    with pytest.raises(ValueError):
        write_zordered(grid, p, ["a", "b"], bits=32)


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([(3, 5)], "x long, y long")
    # x=0b011, y=0b101 -> z bits (b*k+i): b0:x=1,y=1; b1:x=1,y=0;
    # b2:x=0,y=1 -> z = 1+2 + 4+0 + 0+32 = 39
    z = df.select(
        zorder_key([F.col("x"), F.col("y")], bits=3).alias("z")
    ).first()["z"]
    assert z == 39
