"""GTFS text ingest (S1): explicit schemas, >24h time derivation, Parquet
round-trip, and the data-quality expectations job."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from public_transit_data_platform_sql_nosql_spark.sources.ingest import (
    data_quality_report,
    ingest_gtfs,
    load_gtfs,
    read_gtfs_table,
)

_FEED = {
    "calendar.txt": (
        "service_id,monday,tuesday,wednesday,thursday,friday,saturday,"
        "sunday,start_date,end_date\n"
        "1,1,1,1,1,1,0,0,2024-01-01,2024-12-31\n"
        "2,0,0,0,0,0,1,0,2024-01-01,2024-12-31\n"
    ),
    "routes.txt": (
        "route_id,agency_id,route_short_name,route_long_name,route_desc,"
        "route_type,route_color\n"
        "R1,A,501,QUEEN,,0,\n"
        "R2,A,504,KING,,0,FF0000\n"
    ),
    "trips.txt": (
        "trip_id,route_id,service_id,trip_headsign,direction_id,shape_id,"
        "wheelchair_accessible,bikes_allowed\n"
        "T1,R1,1,EAST,0,S1,1,1\n"
        "T2,R2,2,WEST,1,S2,1,1\n"
        "T3,MISSING_ROUTE,1,,0,,0,0\n"
    ),
    "stops.txt": (
        "stop_id,stop_code,stop_name,stop_desc,stop_lat,stop_lon,zone_id,"
        "wheelchair_boarding\n"
        "S1,100,First St,,43.65,-79.38,,1\n"
        "S2,,Second St,,43.66,-79.39,,1\n"
    ),
    "stop_times.txt": (
        "trip_id,arrival_time,departure_time,stop_id,stop_sequence,"
        "stop_headsign,pickup_type,drop_off_type,shape_dist_traveled\n"
        "T1,08:00:00,08:00:30,S1,1,,0,0,0.0\n"
        "T1,25:30:00,25:31:00,S2,2,,0,0,12.5\n"   # GTFS overnight hour 25
        "T2,,,S1,1,,0,0,\n"                        # NULL times
        "T2,09:15:00,09:15:00,S2,2,,0,0,3.0\n"
    ),
}


@pytest.fixture(scope="module")
def feed_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("gtfs_feed")
    for fname, body in _FEED.items():
        (d / fname).write_text(body)
    return str(d)


def test_stop_times_seconds_derivation(spark, feed_dir):
    df = read_gtfs_table(spark, f"{feed_dir}/stop_times.txt", "stop_times")
    rows = {(r["trip_id"], r["stop_sequence"]): r for r in df.collect()}
    assert rows[("T1", 2)]["arrival_secs"] == 25 * 3600 + 30 * 60
    assert rows[("T1", 2)]["arrival_time"] == "25:30:00"  # raw kept
    assert rows[("T2", 1)]["arrival_secs"] is None
    assert rows[("T1", 1)]["departure_secs"] == 8 * 3600 + 30


def test_ingest_roundtrip_and_types(spark, feed_dir, tmp_path):
    out = str(tmp_path / "parquet")
    paths = ingest_gtfs(spark, feed_dir, out)
    assert set(paths) == {"calendar", "routes", "trips", "stops",
                          "stop_times"}
    gtfs = load_gtfs(spark, out)
    st = gtfs["stop_times"]
    assert dict(st.dtypes)["arrival_secs"] == "int"
    assert dict(st.dtypes)["shape_dist_traveled"] == "double"
    assert st.count() == 4
    assert dict(gtfs["calendar"].dtypes)["start_date"] == "date"
    # schemas are explicit, not inferred: stop_code stays a string
    assert dict(gtfs["stops"].dtypes)["stop_code"] == "string"


def test_data_quality_report(spark, feed_dir, tmp_path):
    out = str(tmp_path / "parquet")
    ingest_gtfs(spark, feed_dir, out)
    gtfs = load_gtfs(spark, out)
    report = {r["check"]: r["violations"]
              for r in data_quality_report(gtfs).collect()}
    assert report["stop_times_pk_dup"] == 0
    assert report["trips_fk_route"] == 1     # T3 -> MISSING_ROUTE
    assert report["stop_times_fk_trip"] == 0


def test_bucketed_stop_times_aggregates_without_shuffle(spark, feed_dir,
                                                        tmp_path):
    """The bucketed ingest path is the co-located-join/agg layout for the
    100 TB case: a per-trip aggregation over the bucketed table must plan
    with ZERO Exchange nodes (bucketing replaces the shuffle), and the
    bucketed table must agree row-for-row with the plain parquet."""
    from public_transit_data_platform_sql_nosql_spark.plans import (
        plan_summary,
    )

    out = str(tmp_path / "parquet")
    ingest_gtfs(spark, feed_dir, out, bucket_by_trip=True, buckets=4)
    bucketed = spark.table("gtfs_stop_times_bucketed")
    agg = bucketed.groupBy("trip_id").count()
    s = plan_summary(agg)
    assert s["exchanges"] == 0, s
    plain = spark.read.parquet(f"{out}/stop_times")
    assert bucketed.count() == plain.count()
    # a trip_id-keyed self-join (headway-style pairing) also stays
    # shuffle-free on both sides; disable auto-broadcast so the plan is
    # the sort-merge shape a 100 TB fact-fact join would take (at test
    # size AQE would broadcast, whose BroadcastExchange is not a shuffle)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketed.alias("a").join(bucketed.alias("b"), "trip_id")
        s = plan_summary(j)
        assert s["sort_merge_joins"] == 1, s
        assert s["exchanges"] == 0, s
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


# -- S2 secondary path: JDBC ---------------------------------------------


def test_jdbc_scan_options_rules():
    from public_transit_data_platform_sql_nosql_spark.sources.ingest import (
        jdbc_scan_options,
    )

    opts = jdbc_scan_options("jdbc:x", "t")
    assert opts == {"url": "jdbc:x", "dbtable": "t", "fetchsize": "10000"}
    full = jdbc_scan_options("jdbc:x", "t", partition_column="id",
                             num_partitions=4, lower_bound=0,
                             upper_bound=100, driver="com.example.Driver")
    assert full["partitionColumn"] == "id"
    assert full["numPartitions"] == "4"
    assert full["lowerBound"] == "0"
    assert full["upperBound"] == "100"
    assert full["driver"] == "com.example.Driver"
    with pytest.raises(ValueError, match="missing"):
        jdbc_scan_options("jdbc:x", "t", partition_column="id")


def test_jdbc_round_trip_partitioned(spark, tmp_path):
    """Real JDBC round-trip through the embedded Derby engine Spark
    bundles (driver jar ships with pyspark): write a table over JDBC,
    read it back with read_jdbc_table as a 4-partition sliced scan, and
    check values + the partition count the stride spec produced.
    Embedded Derby is single-JVM — fine under local[*], which is exactly
    the plumbing this test pins (option wiring, stride generation, type
    round-trip); a cluster run points the same reader at a served
    database."""
    from public_transit_data_platform_sql_nosql_spark.sources.ingest import (
        read_jdbc_table,
    )

    url = f"jdbc:derby:{tmp_path}/jdbcdb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    src = spark.range(100).select(
        F.col("id"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"))
    # Derby maps StringType to CLOB by default, which cannot be compared
    # in a pushed WHERE clause — pin VARCHAR like a real schema would
    src.write.format("jdbc").option("url", url).option("driver", driver) \
        .option("createTableColumnTypes", "name VARCHAR(64)") \
        .option("dbtable", "things").save()

    got = read_jdbc_table(spark, url, "things",
                          partition_column="id", num_partitions=4,
                          lower_bound=0, upper_bound=100, driver=driver)
    assert got.rdd.getNumPartitions() == 4
    rows = {(r["id"], r["name"]) for r in got.collect()}
    assert rows == {(i, f"name-{i}") for i in range(100)}
    # projection+filter push into the generated SQL, not post-scan
    one = read_jdbc_table(spark, url, "things", driver=driver) \
        .select("name").filter(F.col("name") == "name-7")
    assert [r["name"] for r in one.collect()] == ["name-7"]


def test_read_jsonl_docs_quarantines_corrupt_lines(spark, tmp_path):
    """Declared-schema JSONL corpus read: good lines land typed, bad
    lines are quarantined in _corrupt_record (not dropped, not fatal),
    and the clean split runs a pipeline operator unchanged."""
    import gzip

    from public_transit_data_platform_sql_nosql_spark.pipeline.text import (
        token_counts,
    )
    from public_transit_data_platform_sql_nosql_spark.sources.ingest import (
        read_jsonl_docs,
    )

    lines = [
        '{"doc_id": 1, "text": "alpha beta", "lang": "en",'
        ' "source": "crawl", "n_chars": 10}',
        'this is not json at all',
        '{"doc_id": 2, "text": "gamma", "lang": "de",'
        ' "source": "crawl", "n_chars": 5}',
        '{"doc_id": "not-a-number", "text": "x"}',
    ]
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(lines) + "\n")
    # a second, gzipped shard — decompressed by extension
    with gzip.open(tmp_path / "corpus2.jsonl.gz", "wt") as f:
        f.write('{"doc_id": 3, "text": "delta eps", "lang": "en",'
                ' "source": "crawl", "n_chars": 9}\n')

    # Spark disallows queries touching ONLY _corrupt_record on a raw
    # JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) -- persist first,
    # as the operator docstring instructs
    df = read_jsonl_docs(spark, str(tmp_path)).persist()
    good = df.filter("_corrupt_record IS NULL").drop("_corrupt_record")
    bad = df.filter("_corrupt_record IS NOT NULL")
    assert {r["doc_id"] for r in good.collect()} == {1, 2, 3}
    assert bad.count() == 2
    got = {r["doc_id"]: r["n_tokens"]
           for r in token_counts(good).collect()}
    assert got[1] == 2 and got[3] == 2
