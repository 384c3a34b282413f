"""GTFS text ingest (S1) — the `LOAD DATA INFILE` / import-wizard step the
reference performs manually (`/root/reference/README.md:104-105`), as one
distributed Spark job:

    ``dataset/{calendar,routes,trips,stops,stop_times}.txt`` (CSV with
    header) -> explicit-schema DataFrames -> columnar Parquet.

Design decisions (SURVEY.md SS1.2-1.4):

- Explicit ``StructType`` per table (model/schemas.py) — never inferSchema
  (one pass, stable types, malformed rows surface instead of silently
  retyping a column).
- ``stop_times`` gains derived ``arrival_secs`` / ``departure_secs``
  IntegerType columns at ingest (functions/gtfs_time.py), because GTFS
  times exceed 24:00:00 and Spark has no TIME type; every downstream
  operator computes on the seconds columns.
- ``mode="PERMISSIVE"`` + a ``_corrupt_record`` column on request: GTFS
  feeds in the wild carry ragged rows; quarantining beats failing a 100 TB
  backfill.

Scale notes: at real scale the one big table is ``stop_times``; we write
it sorted within partitions by ``trip_id`` so the per-trip MIN/MAX
aggregates (Q2) and the trip join (J1) read co-located row groups, and
Parquet min/max row-group stats prune ``trip_id`` point lookups.  The
four dimension tables are tiny and single-file.  An optional
``bucket_by_trip`` switch buckets stop_times for shuffle-free J1 joins on
a real cluster (bucketing needs ``saveAsTable``/a metastore, so it is off
by default in plain-path mode).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.gtfs_time import time_to_secs
from ..model import schemas


def read_gtfs_table(spark: SparkSession, path: str, name: str,
                    keep_corrupt: bool = False) -> DataFrame:
    """One GTFS text file -> typed DataFrame (explicit schema, header)."""
    schema = schemas.GTFS_TABLES[name]
    if keep_corrupt:
        # copy: StructType.add mutates in place and would poison the
        # shared schema object
        from pyspark.sql import types as T
        schema = T.StructType(
            schema.fields + [T.StructField("_corrupt_record",
                                           T.StringType())]
        )
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .schema(schema)
        .csv(path)
    )
    if name == "stop_times":
        df = df.withColumn("arrival_secs", time_to_secs("arrival_time")) \
               .withColumn("departure_secs", time_to_secs("departure_time"))
    return df


def ingest_gtfs(spark: SparkSession, dataset_dir: str, out_dir: str,
                bucket_by_trip: bool = False,
                buckets: int = 64) -> dict[str, str]:
    """Full feed ingest: each ``<name>.txt`` -> ``<out_dir>/<name>`` Parquet.

    Returns {table: parquet_path}.  ``stop_times`` is sorted within
    partitions by (trip_id, stop_sequence) for row-group locality.
    """
    out: dict[str, str] = {}
    for name in schemas.GTFS_TABLES:
        src = os.path.join(dataset_dir, f"{name}.txt")
        dst = os.path.join(out_dir, name)
        df = read_gtfs_table(spark, src, name)
        if name == "stop_times":
            if bucket_by_trip:
                (df.repartition(buckets, "trip_id")
                   .sortWithinPartitions("trip_id", "stop_sequence")
                   .write.mode("overwrite")
                   .bucketBy(buckets, "trip_id")
                   .sortBy("trip_id", "stop_sequence")
                   .option("path", dst)
                   .saveAsTable(f"gtfs_{name}_bucketed"))
            else:
                (df.sortWithinPartitions("trip_id", "stop_sequence")
                   .write.mode("overwrite").parquet(dst))
        else:
            df.coalesce(1).write.mode("overwrite").parquet(dst)
        out[name] = dst
    return out


def jdbc_scan_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    fetch_size: int = 10_000,
    driver: str | None = None,
) -> dict[str, str]:
    """Option dict for a (possibly partitioned) Spark JDBC scan — pure
    function so the construction rules are unit-testable without a live
    database.

    A partitioned scan needs ALL FOUR of partition_column / numPartitions
    / lowerBound / upperBound (Spark's contract: it generates one
    ``WHERE pc >= x AND pc < y`` stride per partition); passing a subset
    raises here, at call time, instead of as an opaque JVM error at plan
    time.  ``fetch_size`` caps rows per DB round-trip (the driver-level
    analog of the reference's 100k-row pagination)."""
    opts = {"url": url, "dbtable": table, "fetchsize": str(fetch_size)}
    if driver is not None:
        opts["driver"] = driver
    part = {"partitionColumn": partition_column,
            "numPartitions": num_partitions,
            "lowerBound": lower_bound,
            "upperBound": upper_bound}
    given = {k: v for k, v in part.items() if v is not None}
    if given and len(given) < 4:
        missing = sorted(set(part) - set(given))
        raise ValueError(
            f"partitioned JDBC scan needs all of {sorted(part)}; "
            f"missing {missing}")
    opts.update({k: str(v) for k, v in given.items()})
    return opts


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    fetch_size: int = 10_000,
    driver: str | None = None,
) -> DataFrame:
    """S2's secondary source path: read a table straight from the
    reference's retained relational store over JDBC
    (`/root/reference/SQL/sql_utils.py:17-20` opens the same MySQL
    connection per request; here it is a declarative source).

    Scale notes: with ``partition_column`` (a roughly-uniform integer
    column — an auto-increment PK) the scan runs as ``num_partitions``
    CONCURRENT slice queries, one per executor task — the distributed
    replacement for the reference's driver-side 100k-row chunk loop
    (SURVEY.md S3).  Without it the whole table funnels through ONE task;
    fine for dimension tables, never for facts.  Catalyst pushes
    projections and filters into the generated SQL (visible as
    PushedFilters in the scan node), so ``read_jdbc_table(...).select(
    "a").filter(...)`` ships only the needed columns/rows out of the
    database.  ``table`` accepts a subquery alias (``"(SELECT ...) t"``)
    for source-side pre-aggregation."""
    reader = spark.read.format("jdbc")
    for k, v in jdbc_scan_options(
        url, table, partition_column, num_partitions,
        lower_bound, upper_bound, fetch_size, driver,
    ).items():
        reader = reader.option(k, v)
    return reader.load()


def load_gtfs(spark: SparkSession, parquet_dir: str) -> dict[str, DataFrame]:
    """Read an ingested feed back as the standard 5-table dict."""
    return {
        name: spark.read.parquet(os.path.join(parquet_dir, name))
        for name in schemas.GTFS_TABLES
    }


def data_quality_report(gtfs: dict[str, DataFrame]) -> DataFrame:
    """The PK/FK expectations the reference enforces in MySQL DDL
    (`transit schema.sql:27,41,56,75,91-94`), as a check job: one row per
    expectation with a violation count (Spark enforces nothing, so quality
    is a query)."""
    st, trips = gtfs["stop_times"], gtfs["trips"]
    checks = {
        "stop_times_pk_dup": (
            st.groupBy("trip_id", "stop_sequence").count()
            .filter(F.col("count") > 1)
        ),
        "trips_pk_dup": (
            trips.groupBy("trip_id").count().filter(F.col("count") > 1)
        ),
        "stop_times_fk_trip": (
            st.join(trips, "trip_id", "left_anti")
        ),
        "stop_times_fk_stop": (
            st.join(gtfs["stops"], "stop_id", "left_anti")
        ),
        "trips_fk_route": (
            trips.join(gtfs["routes"], "route_id", "left_anti")
        ),
    }
    spark = st.sparkSession
    rows = [(k, v.count()) for k, v in checks.items()]
    return spark.createDataFrame(rows, "check string, violations bigint")


DOCS_JSONL_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_jsonl_docs(spark: SparkSession, path: str,
                    schema: str = DOCS_JSONL_SCHEMA) -> DataFrame:
    """Corpus ingestion from JSON-Lines — the wire format training
    corpora actually arrive in (one JSON object per line, typically
    .jsonl or .jsonl.gz; Spark decompresses by extension).  Returns the
    documents-table shape so every pipeline/ operator runs unchanged on
    a fresh crawl drop.

    Scale/robustness notes: the schema is DECLARED, never inferred — on
    100 TB of crawl output an inference pass is a full extra read, and
    one odd record must not re-type a column.  PERMISSIVE mode with a
    ``_corrupt_record`` column quarantines malformed lines instead of
    failing the job or silently dropping them; callers split on
    ``_corrupt_record IS NULL`` and route the rest to a dead-letter
    sink.  Spark refuses plans that read ONLY ``_corrupt_record`` from
    the raw scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — persist the read
    (or land it to parquet) before counting/collecting the quarantine
    split on its own.  JSONL is splittable line-by-line (uncompressed), so the read
    parallelizes like any text source; .gz files are one split each —
    shard uploads accordingly (or use zstd/bzip2 seekable variants).
    """
    return (
        spark.read
        .schema(schema + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
