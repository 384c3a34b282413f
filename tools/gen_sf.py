"""Generate a matched-scale TPC-H-ish fixture for benching beyond the
driver's sf0.1 cap.

The reference's published numbers are for ~4.3M stop_times rows
(BASELINE.md); the driver-provided testdata tops out at sf0.1 (~600k
lineitem rows -> ~600k stop_times), so the baseline comparison is
nearest-scale, not matched-scale.  The GTFS inputs are synthetic and
schema-derived (sources/tpch_adapter.py maps part/nation/orders/lineitem
to stops/routes/trips/stop_times), so a matched-scale point is one
generation away: this script writes schema-compatible tables at any sf
with the same key ranges, fanouts, and null/eccentricity structure the
driver fixtures show (dense orderkeys, ~4 lines/order, custkey %25
route skew inputs, quantity 1..50), scaled linearly.

It is a BENCH fixture only — value-level distributions are not
bit-compatible with the driver's generator, so no DuckDB oracle runs on
it (timings only; correctness stays pinned at sf0.001/0.01).

Usage:  python tools/gen_sf.py [--sf 1.0] [--out /tmp/sfgen/sf1]
Then:   SPARK_GRAFT_SF_DIR=/tmp/sfgen/sf1 \
        SPARK_GRAFT_QUERIES=q1_busiest_stops,q2_route_stats_whole_week,\
q3_transfer_points,q4_top_routes_daily,denormalize_check python bench.py
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from public_transit_data_platform_sql_nosql_spark.session import get_spark  # noqa: E402

# sf1.0 base cardinalities (10x the driver's sf0.1 fixtures, which match
# TPC-H's own sf0.1 row counts)
BASE = {
    "orders": 1_500_000,
    "lineitem_per_order_max": 7,
    "part": 200_000,
    "supplier": 10_000,
    "customer": 150_000,
    # the LLM-pipeline corpus, same 10x-the-driver's-sf0.1 rule
    # (documents 5k -> 50k, embeddings 2k -> 20k) so the pipeline
    # heavyweights get a matched-scale trend line alongside q1-q4
    "documents": 50_000,
    "embeddings": 20_000,
    # the event stream (events 100k -> 1M, users 1.5k -> 15k over the
    # same 30-day window) for the asof/range/interval join family
    "events": 1_000_000,
    "event_users": 15_000,
}

_ETYPES = ("view", "click", "purchase", "signup", "error")

# the driver corpus's own bag-of-words shape: short data-engineering
# tokens, uniform draws per position (sampled from sf0.1: 8-100 words,
# ~50 avg; 5 langs with en ~41%; 20 uniform sources; ~0.2% exact dups)
_VOCAB = ("spark", "batch", "part", "line", "column", "order", "small",
          "sort", "fast", "value", "scan", "hash", "slow", "group",
          "agg", "filter", "query", "a", "big", "key", "window",
          "vector", "table", "stream", "the", "join", "merge", "data",
          "customer", "row", "plan", "shuffle", "read", "write",
          "cache", "skew", "code", "stage", "task", "broadcast")
_LANGS = ("en",) * 14 + ("de",) * 5 + ("fr",) * 5 + ("zh",) * 5 \
    + ("es",) * 5

_SEG = ("FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD")
_PRIO = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
_PNAME_A = ("large", "hot", "small", "cold", "dim", "shiny", "plain",
            "round")
_PNAME_B = ("ring", "bolt", "cog", "pin", "widget", "lens", "strap",
            "valve")
_PTYPE = ("LARGE", "ECONOMY", "STANDARD", "MEDIUM", "PROMO")


def _mix(col, salt: int):
    """Deterministic pseudo-random non-negative int from an id column —
    integer multiply/xor mixing only (stable across runs and engines).
    Each multiply is pmod-bounded to 2^31 first so the bigint products
    stay far from overflow (ANSI mode would raise)."""
    x = F.pmod((col + F.lit(salt)) * F.lit(2654435761), F.lit(2**31))
    return F.pmod(
        F.shiftright(x, 7).bitwiseXOR(x) * F.lit(2246822519), F.lit(2**31))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="/tmp/sfgen/sf1")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()
    sf = args.sf
    out = args.out

    spark = get_spark(app_name="gen-sf", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    n_orders = int(BASE["orders"] * sf)
    n_part = int(BASE["part"] * sf)
    n_supp = int(BASE["supplier"] * sf)
    n_cust = int(BASE["customer"] * sf)

    spark.createDataFrame(
        [(i, n) for i, n in enumerate(
            ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"))],
        "r_regionkey int, r_name string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/region.parquet")

    spark.createDataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(25)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/nation.parquet")

    (spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        (_mix(F.col("id"), 11) % 25).cast("int").alias("c_nationkey"),
        ((_mix(F.col("id"), 12) % 999_900) / 100.0 + 1.0)
        .alias("c_acctbal"),
        F.element_at(F.array(*[F.lit(s) for s in _SEG]),
                     (_mix(F.col("id"), 13) % 5 + 1).cast("int"))
        .alias("c_mktsegment"))
     .write.mode("overwrite").parquet(f"{out}/customer.parquet"))

    (spark.range(n_supp).select(
        F.col("id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
        (_mix(F.col("id"), 21) % 25).cast("int").alias("s_nationkey"),
        ((_mix(F.col("id"), 22) % 999_900) / 100.0 + 1.0)
        .alias("s_acctbal"))
     .write.mode("overwrite").parquet(f"{out}/supplier.parquet"))

    (spark.range(n_part).select(
        F.col("id").alias("p_partkey"),
        F.concat_ws(
            " ",
            F.element_at(F.array(*[F.lit(s) for s in _PNAME_A]),
                         (_mix(F.col("id"), 31) % 8 + 1).cast("int")),
            F.element_at(F.array(*[F.lit(s) for s in _PNAME_B]),
                         (_mix(F.col("id"), 32) % 8 + 1).cast("int")))
        .alias("p_name"),
        F.format_string("Brand#%d", (_mix(F.col("id"), 33) % 25))
        .alias("p_brand"),
        F.element_at(F.array(*[F.lit(s) for s in _PTYPE]),
                     (_mix(F.col("id"), 34) % 5 + 1).cast("int"))
        .alias("p_type"),
        (_mix(F.col("id"), 35) % 50 + 1).cast("int").alias("p_size"),
        (900.0 + (F.col("id") % 1000) / 10.0).alias("p_retailprice"))
     .write.mode("overwrite").parquet(f"{out}/part.parquet"))

    orders = spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        (_mix(F.col("id"), 41) % n_cust).alias("o_custkey"),
        F.element_at(F.array(F.lit("O"), F.lit("F"), F.lit("P")),
                     (_mix(F.col("id"), 42) % 3 + 1).cast("int"))
        .alias("o_orderstatus"),
        ((_mix(F.col("id"), 43) % 45_000_000) / 100.0 + 900.0)
        .alias("o_totalprice"),
        F.timestamp_seconds(
            F.lit(788918400)                    # 1995-01-01 UTC
            + (_mix(F.col("id"), 44) % 2400) * F.lit(86400))
        .alias("o_orderdate"),
        F.element_at(F.array(*[F.lit(s) for s in _PRIO]),
                     (_mix(F.col("id"), 45) % 5 + 1).cast("int"))
        .alias("o_orderpriority"))
    orders.write.mode("overwrite").parquet(f"{out}/orders.parquet")

    # ~4.08 lines/order like the fixtures: 1 + (mix % 7) averages 4
    lineitem = (
        spark.range(n_orders)
        .select(F.col("id").alias("l_orderkey"),
                (_mix(F.col("id"), 51) % BASE["lineitem_per_order_max"]
                 + 1).cast("int").alias("n_lines"))
        .select("l_orderkey",
                F.explode(F.sequence(F.lit(1), F.col("n_lines")))
                .alias("l_linenumber"))
        .select(
            "l_orderkey",
            (_mix(F.col("l_orderkey") * 8 + F.col("l_linenumber"), 52)
             % n_part).alias("l_partkey"),
            (_mix(F.col("l_orderkey") * 8 + F.col("l_linenumber"), 53)
             % n_supp).alias("l_suppkey"),
            F.col("l_linenumber").cast("int"),
            (_mix(F.col("l_orderkey") * 8 + F.col("l_linenumber"), 54)
             % 50 + 1).cast("double").alias("l_quantity"),
            ((_mix(F.col("l_orderkey") * 8 + F.col("l_linenumber"), 55)
              % 10_000_000) / 100.0 + 900.0).alias("l_extendedprice"),
            ((_mix(F.col("l_orderkey") * 8 + F.col("l_linenumber"), 56)
              % 11) / 100.0).alias("l_discount"),
            ((_mix(F.col("l_orderkey") * 8 + F.col("l_linenumber"), 57)
              % 9) / 100.0).alias("l_tax"),
            F.element_at(F.array(F.lit("R"), F.lit("N"), F.lit("A")),
                         (_mix(F.col("l_orderkey") * 8
                               + F.col("l_linenumber"), 58) % 3 + 1)
                         .cast("int")).alias("l_returnflag"),
            F.element_at(F.array(F.lit("O"), F.lit("F")),
                         (_mix(F.col("l_orderkey") * 8
                               + F.col("l_linenumber"), 59) % 2 + 1)
                         .cast("int")).alias("l_linestatus"),
            F.timestamp_seconds(
                F.lit(788918400)
                + (_mix(F.col("l_orderkey") * 8 + F.col("l_linenumber"),
                        60) % 2500) * F.lit(86400)).alias("l_shipdate"),
        ))
    lineitem.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    n_docs = int(BASE["documents"] * sf)
    n_vec = int(BASE["embeddings"] * sf)
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    langs = F.array(*[F.lit(w) for w in _LANGS])
    # ~0.2% exact dups: every 500th doc copies its predecessor's text
    # (the shape pipeline/source.py's docs_aug augmentation and the
    # exact-dedup family expect from the driver corpus)
    eff = (F.col("id")
           - F.when(F.col("id") % 500 == 499, F.lit(1)).otherwise(0))
    n_words = _mix(eff, 71) % 92 + 8
    text = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            vocab,
            (_mix(eff * 128 + i, 72) % len(_VOCAB) + 1).cast("int"))))
    (spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.element_at(langs, (_mix(F.col("id"), 73) % len(_LANGS) + 1)
                     .cast("int")).alias("lang"),
        F.format_string("src%d", (_mix(F.col("id"), 74) % 20))
        .alias("source"))
     .withColumn("n_chars", F.length("text").cast("long"))
     .write.mode("overwrite").parquet(f"{out}/documents.parquet"))

    # 10-label cluster structure like the driver's: per-label center
    # plus per-vector noise, dim 64 float32
    lbl = (_mix(F.col("id"), 81) % 10).cast("int")
    emb = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda j: (
            ((_mix(lbl.cast("long") * 64 + j, 82) % 1000)
             / F.lit(1000.0) - F.lit(0.5))
            + ((_mix(F.col("id") * 64 + j, 83) % 1000)
               / F.lit(1000.0) - F.lit(0.5)) * F.lit(0.3)
        ).cast("float"))
    (spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        emb.alias("embedding"),
        lbl.alias("label"))
     .write.mode("overwrite").parquet(f"{out}/embeddings.parquet"))

    n_events = int(BASE["events"] * sf)
    n_users = max(1, int(BASE["event_users"] * sf))
    etypes = F.array(*[F.lit(t) for t in _ETYPES])
    span_us = 30 * 86_400 * 1_000_000          # the driver's 30 days
    start_us = 1_704_067_200_000_000           # 2024-01-01 UTC
    (spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(start_us) + F.col("id") * F.lit(span_us // n_events)
            + _mix(F.col("id"), 91) % 1_000_000).alias("ts"),
        (_mix(F.col("id"), 92) % n_users).alias("user_id"),
        F.element_at(etypes, (_mix(F.col("id"), 93) % 5 + 1)
                     .cast("int")).alias("event_type"),
        ((_mix(F.col("id"), 94) % 20_000) / 100.0).alias("value"),
        F.format_string('{"k": %d}', (_mix(F.col("id"), 95) % 100))
        .alias("props"))
     .write.mode("overwrite").parquet(f"{out}/events.parquet"))

    counts = {t: spark.read.parquet(f"{out}/{t}.parquet").count()
              for t in ("region", "nation", "customer", "supplier",
                        "part", "orders", "lineitem", "documents",
                        "embeddings", "events")}
    print({"sf": sf, "out": out, "rows": counts})
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
