"""Physical-plan introspection — the engine's scale guardrails.

The reference delegates planning to MySQL and "verifies" it by EXPLAIN in
a shell (`/root/reference/README.md:184-189`); here the same discipline is
a library: every property that makes a pipeline survive a 100x scale-up
(filters reaching the Parquet scan, dimension joins broadcasting, no
cartesian products, orderBy+limit planned as TakeOrderedAndProject, wide
whole-stage-codegen spans) is a queryable predicate that CI asserts on
(tests/test_plans.py) and operators can log before a big run.

These read Catalyst's formatted output via the JVM handles — strings, not
private APIs — so they work on any DataFrame regardless of source.
"""

from __future__ import annotations

import itertools
import re
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE-prep) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    """Catalyst optimized logical plan as text."""
    return df._jdf.queryExecution().optimizedPlan().toString()


def broadcast_join_count(df: DataFrame) -> int:
    return executed_plan(df).count("BroadcastHashJoin")


def sort_merge_join_count(df: DataFrame) -> int:
    return executed_plan(df).count("SortMergeJoin")


def pushed_filters(df: DataFrame) -> list[str]:
    """Predicates that reached the Parquet scans (``PushedFilters: [...]``
    segments, one list entry per scan)."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", executed_plan(df))


def scan_read_schemas(df: DataFrame) -> list[str]:
    """Column sets each file scan actually reads (``ReadSchema`` segments)
    — the column-pruning check: a scan reading columns the query never
    touches is a plan bug."""
    return re.findall(r"ReadSchema: struct<([^>]*)>", executed_plan(df))


_JOB_GROUP_SEQ = itertools.count()


def jobs_run(spark: SparkSession, thunk: Callable[[], object]) -> int:
    """Number of Spark jobs ``thunk()`` triggers — the serving-path
    guardrail (a request handler that fires a probe job before its real
    query doubles cluster load per request).  Counts via a scoped job
    group, so concurrent work in other threads is not attributed.  Note
    one *action* can be several *jobs* under AQE (each materialized
    shuffle stage is a job) — compare against the same action run
    directly rather than asserting a literal 1."""
    sc = spark.sparkContext
    props = ("spark.jobGroup.id", "spark.job.description",
             "spark.job.interruptOnCancel")
    saved = {p: sc.getLocalProperty(p) for p in props}
    group = f"jobcount-{next(_JOB_GROUP_SEQ)}"
    sc.setJobGroup(group, "jobs_run probe")
    try:
        thunk()
    finally:
        # setJobGroup sets all three thread-locals; restore the caller's
        # values so an enclosing job group (e.g. request cancellation)
        # keeps working after the probe
        for p in props:
            sc.setLocalProperty(p, saved[p])
    return len(sc.statusTracker().getJobIdsForGroup(group))


def plan_summary(df: DataFrame) -> dict:
    """One-call scale screening of a plan."""
    plan = executed_plan(df)
    return {
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "cartesian_products": plan.count("CartesianProduct"),
        "broadcast_nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "exchanges": plan.count("Exchange"),
        "take_ordered_and_project": "TakeOrderedAndProject" in plan,
        # executedPlan().toString() marks codegen'd operators "*(N) Op";
        # distinct N = number of fused codegen spans.  Caveat: under AQE
        # the pre-execution plan is unfinalized and shows 0 spans until
        # the query has run — execute (e.g. .count()) before reading this
        # field on exchange-bearing plans
        "wholestage_codegen_spans": len(
            set(re.findall(r"\*\((\d+)\)", plan))),
        "file_scans": plan.count("FileScan"),
        "pushed_filters": pushed_filters(df),
        "read_schemas": scan_read_schemas(df),
    }
