"""salted_join: exact parity with the plain join under heavy key skew,
salt actually spreading the hot key, and deterministic salting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from public_transit_data_platform_sql_nosql_spark.operators.skew import (
    salted_join,
)


def _skewed(spark):
    # 90% of fact rows share key 'hot'; dim has 1-2 rows per key
    big = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}", i * 7) for i in range(2000)],
        "row_id long, k string, v long",
    )
    small = spark.createDataFrame(
        [("hot", 1), ("hot", 2), ("k10", 3), ("k20", 4), ("nomatch", 5)],
        "k string, dim long",
    )
    return big, small


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain(spark, how):
    big, small = _skewed(spark)
    plain = {(r["row_id"], r["dim"])
             for r in big.join(small, "k", how).collect()}
    salted = {(r["row_id"], r["dim"])
              for r in salted_join(big, small, "k", how,
                                   n_salt=8).collect()}
    assert salted == plain and plain
    # many-to-many multiplicity preserved: 'hot' has 2 dim rows
    n_hot_plain = sum(1 for _, d in plain if d in (1, 2))
    assert n_hot_plain == 2 * 1800


def test_salt_spreads_hot_key_and_is_deterministic(spark):
    big, small = _skewed(spark)
    from public_transit_data_platform_sql_nosql_spark.operators.skew import (
        _SALT,
    )

    salted = big.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                      F.lit(8)).cast("int"))
    hot_salts = (salted.filter(F.col("k") == "hot")
                 .select(_SALT).distinct().count())
    assert hot_salts == 8  # hot key's rows really fan out
    a = {(r["row_id"], r[_SALT]) for r in salted.collect()}
    b = {(r["row_id"], r[_SALT]) for r in salted.collect()}
    assert a == b  # no rand(): recomputation yields identical salts


def test_salted_join_rejects_replication_unsafe_how(spark):
    big, small = _skewed(spark)
    with pytest.raises(ValueError, match="inner|left"):
        salted_join(big, small, "k", "right")
