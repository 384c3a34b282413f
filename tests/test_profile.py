"""Table profiler: exact variant vs DuckDB, approx variant error-bounded
vs exact, single-scan plan shape."""

from __future__ import annotations

import __spark_entry__ as E
from public_transit_data_platform_sql_nosql_spark.pipeline import (
    profile as prof,
)
from public_transit_data_platform_sql_nosql_spark.plans import plan_summary
from tests.conftest import SF_DIR, duckdb_rows, spark_rows


def test_table_profile_matches_duckdb(spark, ddb):
    s = spark_rows(E.queries()["table_profile"](spark, SF_DIR))
    d = duckdb_rows(ddb, E.oracle_sql()["table_profile"])
    assert s == d


def test_approx_profile_within_error_bound(spark):
    docs = E._aug(spark, SF_DIR)
    exact = {r["column"]: r["n_distinct"]
             for r in prof.table_profile(docs).collect()}
    approx = prof.approx_profile(docs, rsd=0.05).collect()
    for r in approx:
        e = exact[r["column"]]
        # HLL++ at rsd=0.05: allow 4 sigma
        assert abs(r["n_distinct"] - e) <= max(2, 0.2 * e), (r["column"],
                                                             r["n_distinct"],
                                                             e)
        # the non-distinct stats are identical (same expressions)
        assert r["n_rows"] == docs.count()


def test_profile_is_single_scan(spark):
    docs = E._aug(spark, SF_DIR)
    # docs_aug is a union of two reads of the same file; profile must
    # not multiply that — the approx path stays one aggregation with no
    # per-column re-scan (file_scans == the union's own 2)
    p = plan_summary(prof.approx_profile(docs))
    assert p["file_scans"] <= 2
