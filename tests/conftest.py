from __future__ import annotations

import math

import duckdb
import pytest

from public_transit_data_platform_sql_nosql_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    return v


def canonical_rows(columns, rows):
    """Mimic the driver's order-insensitive compare: sort columns by name,
    normalize NaN->None, sort rows by repr."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [columns[i] for i in order], out


def spark_rows(df):
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return canonical_rows(cols, rows)


def duckdb_rows(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return canonical_rows(cols, rows)


def assert_matches(df, con, sql, name=""):
    scols, srows = spark_rows(df)
    dcols, drows = duckdb_rows(con, sql)
    assert scols == dcols, f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs {len(drows)}"
    )
    for i, (a, b) in enumerate(zip(srows, drows)):
        assert a == b, f"{name}: row {i} differs:\n spark={a}\n duck ={b}"
