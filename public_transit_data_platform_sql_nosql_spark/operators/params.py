"""Query-parameter semantics shared by all four analytics queries
(SURVEY.md SS1.5).

- ``service_id``: '1' Weekday / '2' Saturday / '3' Sunday; '4', '', None =
  the "whole week" sentinel meaning NO filter
  (`/root/reference/SQL/sql_utils.py:40-43`, `csv_backend.py:42`).
- ``limit``: positive int (default 20, junk/non-positive -> 20) or the
  literal ``'all'`` -> unlimited (`/root/reference/SQL/sql_utils.py:23-37`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LIMIT = 20
PUBLIC_SERVICE_IDS = ("1", "2", "3")


def normalize_service_id(service_id: object) -> str | None:
    """'4' / '' / None / non-public values -> None (no filter)."""
    if service_id is None:
        return None
    sid = str(service_id).strip()
    return sid if sid in PUBLIC_SERVICE_IDS else None


def sanitize_limit(limit: object) -> int | None:
    """None => 20; 'all' (any case) => None (unlimited); junk / <=0 => 20."""
    if limit is None:
        return DEFAULT_LIMIT
    s = str(limit).strip().lower()
    if s == "all":
        return None
    try:
        n = int(s)
    except (TypeError, ValueError):
        return DEFAULT_LIMIT
    return n if n > 0 else DEFAULT_LIMIT


def apply_service_filter(df: DataFrame, service_id: object,
                         col: str = "service_id") -> DataFrame:
    """P2/P3: optional equality filter, disabled for the whole-week sentinel.

    Expressed as a conditional at plan-build time (cleaner than replicating
    the reference's ``(:sid IS NULL OR t.service_id = :sid)`` OR-predicate,
    and lets Catalyst push a plain equality down to the parquet scan).
    """
    sid = normalize_service_id(service_id)
    return df if sid is None else df.filter(F.col(col) == sid)


def apply_limit(df: DataFrame, limit: object) -> DataFrame:
    n = sanitize_limit(limit)
    return df if n is None else df.limit(n)


def public_services_only(col: str = "service_id") -> Column:
    """P7: keep only public services ('1','2','3'),
    `/root/reference/Mongo/app.py:131-135`."""
    return F.col(col).isin(*PUBLIC_SERVICE_IDS)
