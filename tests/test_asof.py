"""asof_join / range_join: differential correctness (DuckDB ASOF JOIN,
brute-force python) and the plan guarantees that make them scale (no
nested-loop/cartesian shapes)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from public_transit_data_platform_sql_nosql_spark.operators.asof import (
    interval_join,
    asof_join,
    range_join,
)
from public_transit_data_platform_sql_nosql_spark.plans import executed_plan


def _trades_quotes(spark):
    # deterministic, collision-bearing: several keys, repeated instants
    trades = spark.createDataFrame(
        [(i, f"k{i % 3}", (i * 37) % 100) for i in range(60)],
        "trade_id long, sym string, ts long",
    )
    quotes = spark.createDataFrame(
        [(f"k{j % 3}", (j * 11) % 100, 1000 + j) for j in range(40)],
        "sym string, ts long, px long",
    ).groupBy("sym", "ts").agg(F.max("px").alias("px"))  # unique (key, ts)
    return trades, quotes


def test_asof_backward_matches_duckdb(spark):
    trades, quotes = _trades_quotes(spark)
    got = {
        (r["trade_id"], r["px_asof"], r["ts_asof"])
        for r in asof_join(trades, quotes, on="ts", by="sym").collect()
    }
    con = duckdb.connect()
    con.register("trades", trades.toPandas())
    con.register("quotes", quotes.toPandas())
    want = set(con.execute("""
        SELECT t.trade_id, q.px, q.ts
        FROM trades t ASOF LEFT JOIN quotes q
          ON t.sym = q.sym AND q.ts <= t.ts
    """).fetchall())
    assert got == want


def test_asof_forward_and_tolerance(spark):
    trades, quotes = _trades_quotes(spark)
    qrows = [(r["sym"], r["ts"], r["px"]) for r in quotes.collect()]

    def naive(sym, ts, direction, tol):
        if direction == "backward":
            cand = [(qts, px) for qs, qts, px in qrows
                    if qs == sym and qts <= ts]
            best = max(cand, default=None)
        else:
            cand = [(qts, px) for qs, qts, px in qrows
                    if qs == sym and qts >= ts]
            best = min(cand, default=None)
        if best is None or (tol is not None and abs(best[0] - ts) > tol):
            return (None, None)
        return (best[1], best[0])

    for direction in ("backward", "forward"):
        for tol in (None, 7):
            got = {
                (r["trade_id"], r["px_asof"], r["ts_asof"])
                for r in asof_join(trades, quotes, on="ts", by="sym",
                                   direction=direction,
                                   tolerance=tol).collect()
            }
            want = {
                (r["trade_id"],
                 *naive(r["sym"], r["ts"], direction, tol))
                for r in trades.collect()
            }
            assert got == want, (direction, tol)


def test_asof_no_join_in_plan(spark):
    """The whole point: one window, zero joins of any kind."""
    trades, quotes = _trades_quotes(spark)
    plan = executed_plan(asof_join(trades, quotes, on="ts", by="sym"))
    for op in ("BroadcastNestedLoopJoin", "CartesianProduct",
               "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert op not in plan, plan
    assert "Window" in plan


def test_asof_validates_inputs(spark):
    trades, quotes = _trades_quotes(spark)
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, on="ts", by="sym", direction="sideways")
    with pytest.raises(ValueError, match="lacks join column"):
        asof_join(trades, quotes.drop("sym"), on="ts", by="sym")
    with pytest.raises(ValueError, match="bucket_width"):
        asof_join(trades, quotes, on="ts", by="sym", bucket_width=0)
    with pytest.raises(ValueError, match="bucket_width"):
        asof_join(trades, quotes, on="ts", by="sym", bucket_width=-5)


def test_asof_null_right_ts_never_matches(spark):
    """A right row with null ts must not leak its value columns into
    matches (pandas merge_asof / DuckDB ASOF parity)."""
    left = spark.createDataFrame([(1, "a", 10)], "lid long, k string, ts long")
    right = spark.createDataFrame(
        [("a", None, 777)], "k string, ts long, v long")
    rows = asof_join(left, right, on="ts", by="k").collect()
    assert len(rows) == 1
    assert rows[0]["v_asof"] is None and rows[0]["ts_asof"] is None
    # and with a real match present, the null-ts row still never wins
    right2 = spark.createDataFrame(
        [("a", None, 777), ("a", 5, 42)], "k string, ts long, v long")
    rows2 = asof_join(left, right2, on="ts", by="k").collect()
    assert (rows2[0]["v_asof"], rows2[0]["ts_asof"]) == (42, 5)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tol", [None, 7])
@pytest.mark.parametrize("width", [1, 8, 64, 1000])
def test_asof_bucketed_matches_flat(spark, direction, tol, width):
    """The hot-key escape hatch returns the exact flat-path answer for
    every direction/tolerance/width combination, including widths far
    larger (one bucket) and far smaller (per-instant buckets) than the
    data spread."""
    trades, quotes = _trades_quotes(spark)
    flat = {
        tuple(r) for r in asof_join(
            trades, quotes, on="ts", by="sym",
            direction=direction, tolerance=tol).collect()
    }
    bucketed = {
        tuple(r) for r in asof_join(
            trades, quotes, on="ts", by="sym",
            direction=direction, tolerance=tol,
            bucket_width=width).collect()
    }
    assert bucketed == flat


def test_asof_bucketed_hot_key_spreads_and_matches_duckdb(spark):
    """ONE key carrying every row — the flat path's worst case.  The
    bucketed path must (a) partition the big window by (key, bucket) so
    the hot key runs multi-task, and (b) still match DuckDB ASOF JOIN."""
    left = spark.createDataFrame(
        [(i, "hot", (i * 37) % 1000) for i in range(600)],
        "lid long, k string, ts long",
    )
    right = spark.createDataFrame(
        [("hot", (j * 13) % 990, 100 + j) for j in range(300)],
        "k string, ts long, v long",
    ).groupBy("k", "ts").agg(F.max("v").alias("v"))
    out = asof_join(left, right, on="ts", by="k", bucket_width=100)
    got = {(r["lid"], r["v_asof"], r["ts_asof"]) for r in out.collect()}
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("r", right.toPandas())
    want = set(con.execute("""
        SELECT l.lid, r.v, r.ts
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND r.ts <= l.ts
    """).fetchall())
    assert got == want
    # the in-bucket window is keyed by (k, _asof_bkt), not k alone
    plan = executed_plan(out)
    assert "_asof_bkt" in plan, plan


def test_range_join_matches_naive_and_plan(spark):
    points = spark.createDataFrame(
        [(i, f"u{i % 5}", (i * 61) % 500) for i in range(200)],
        "pid long, user string, ts long",
    )
    intervals = spark.createDataFrame(
        [(j, f"u{j % 5}", (j * 97) % 400, (j * 97) % 400 + 30 + (j % 4) * 40)
         for j in range(40)]
        + [(99, "u0", 50, 50)],  # degenerate: dropped
        "iid long, user string, lo long, hi long",
    )
    out = range_join(points, intervals, point_on="ts",
                     start_col="lo", end_col="hi", by="user",
                     bucket_width=64)
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    prow = [(r["pid"], r["user"], r["ts"]) for r in points.collect()]
    irow = [(r["iid"], r["user"], r["lo"], r["hi"])
            for r in intervals.collect()]
    want = {(p, i) for p, pu, ts in prow for i, iu, lo, hi in irow
            if pu == iu and lo <= ts < hi}
    assert got == want and got
    plan = executed_plan(out)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_auto_width_and_validation(spark):
    points = spark.createDataFrame(
        [(i, (i * 61) % 500) for i in range(200)],
        "pid long, ts long",
    )
    intervals = spark.createDataFrame(
        [(j, (j * 97) % 400, (j * 97) % 400 + 30 + (j % 4) * 40)
         for j in range(40)],
        "iid long, lo long, hi long",
    )
    # auto width (median interval length) gives the same matches as an
    # explicit width
    auto = range_join(points, intervals, point_on="ts",
                      start_col="lo", end_col="hi")
    explicit = range_join(points, intervals, point_on="ts",
                          start_col="lo", end_col="hi", bucket_width=64)
    got_auto = {(r["pid"], r["iid"]) for r in auto.collect()}
    got_explicit = {(r["pid"], r["iid"]) for r in explicit.collect()}
    assert got_auto == got_explicit and got_auto
    # auto width bounds the explosion: exploded interval rows stay
    # within ~(len/median + 1) per interval; with len in [30, 150] and
    # median ~90, that is < 3 buckets per interval on average
    med = sorted(r["hi"] - r["lo"] for r in intervals.collect())[20]
    from pyspark.sql import functions as SF
    exploded = intervals.select(
        SF.explode(SF.sequence(
            SF.expr(f"lo DIV {med}"), SF.expr(f"(hi - 1) DIV {med}")
        ))).count()
    assert exploded <= 3 * intervals.count()
    for bad in (0, -7):
        with pytest.raises(ValueError, match="bucket_width"):
            range_join(points, intervals, point_on="ts",
                       start_col="lo", end_col="hi", bucket_width=bad)
    # degenerate-only intervals: empty result, no crash, any auto width
    degen = spark.createDataFrame([(1, 9, 9)], "iid long, lo long, hi long")
    assert range_join(points, degen, point_on="ts",
                      start_col="lo", end_col="hi").count() == 0


def test_collision_guards(spark):
    trades, quotes = _trades_quotes(spark)
    with pytest.raises(ValueError, match="collide"):
        asof_join(trades.withColumn("px_asof", F.lit(1)), quotes,
                  on="ts", by="sym")
    pts = spark.createDataFrame([(1, 5)], "pid long, ts long")
    iv = spark.createDataFrame([(2, 0, 10)], "iid long, lo long, hi long")
    with pytest.raises(ValueError, match="_bucket"):
        range_join(pts.withColumn("_bucket", F.lit(0)), iv,
                   point_on="ts", start_col="lo", end_col="hi")
    with pytest.raises(ValueError, match="both sides"):
        range_join(pts, iv.withColumnRenamed("iid", "pid"),
                   point_on="ts", start_col="lo", end_col="hi")


def _interval_fixtures(spark, seed=7):
    """Seeded random intervals on both sides: mixed lengths (1..40),
    duplicate keys, degenerate rows, multi-bucket spans."""
    import random
    rng = random.Random(seed)
    lrows = [(i, f"k{rng.randrange(4)}", s := rng.randrange(200),
              s + rng.choice([0, 1, 3, 12, 40]))
             for i in range(80)]
    rrows = [(j, f"k{rng.randrange(4)}", s := rng.randrange(200),
              s + rng.choice([0, 2, 7, 25]))
             for j in range(60)]
    left = spark.createDataFrame(
        lrows, "lid long, key string, ls long, le long")
    right = spark.createDataFrame(
        rrows, "rid long, key string, rs long, re long")
    return left, right, lrows, rrows


def _naive_overlaps(lrows, rrows, with_key):
    return {
        (lid, rid)
        for lid, lk, ls, le in lrows if le > ls
        for rid, rk, rs, re in rrows if re > rs
        if (not with_key or lk == rk) and ls < re and rs < le
    }


@pytest.mark.parametrize("width", [None, 1, 5, 64, 1000])
def test_interval_join_matches_naive(spark, width):
    left, right, lrows, rrows = _interval_fixtures(spark)
    got = {
        (r["lid"], r["rid"])
        for r in interval_join(
            left, right.drop("key").withColumnRenamed("rid", "rid"),
            "ls", "le", "rs", "re", bucket_width=width).collect()
    }
    assert got == _naive_overlaps(lrows, rrows, with_key=False)


@pytest.mark.parametrize("width", [None, 3, 50])
def test_interval_join_by_key_matches_naive(spark, width):
    left, right, lrows, rrows = _interval_fixtures(spark)
    got = {
        (r["lid"], r["rid"])
        for r in interval_join(left, right, "ls", "le", "rs", "re",
                               by="key", bucket_width=width).collect()
    }
    assert got == _naive_overlaps(lrows, rrows, with_key=True)


def test_interval_join_pair_claimed_once(spark):
    # one long left interval overlapping one long right interval across
    # many shared buckets -> exactly ONE output row, not one per bucket
    left = spark.createDataFrame([(1, 0, 100)], "lid long, ls long, le long")
    right = spark.createDataFrame([(2, 5, 95)], "rid long, rs long, re long")
    rows = interval_join(left, right, "ls", "le", "rs", "re",
                         bucket_width=10).collect()
    assert len(rows) == 1


def test_interval_join_plan_and_validation(spark):
    left, right, _, _ = _interval_fixtures(spark)
    df = interval_join(left, right, "ls", "le", "rs", "re", by="key")
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    with pytest.raises(ValueError, match="positive integer"):
        interval_join(left, right, "ls", "le", "rs", "re", by="key",
                      bucket_width=0)
    with pytest.raises(ValueError, match="exist on both sides"):
        interval_join(left, left.withColumnRenamed("lid", "x"),
                      "ls", "le", "ls", "le")
