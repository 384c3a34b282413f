"""Cleaning operators: Python-mirror collapse semantics, PII redaction
on injected fixtures, DuckDB differentials, and the shuffle-free plan
shape (cleaning must fuse into the scan)."""

from __future__ import annotations

import re

import __spark_entry__ as E
from public_transit_data_platform_sql_nosql_spark.pipeline import (
    cleaning as cl,
)
from public_transit_data_platform_sql_nosql_spark.plans import plan_summary
from tests.conftest import SF_DIR, duckdb_rows, spark_rows


def test_collapse_runs_matches_python_mirror(spark):
    docs = E._aug(spark, SF_DIR)
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {r["doc_id"]: (r["n_before"], r["n_after"], r["clean_text"])
           for r in cl.collapse_token_runs(docs).collect()}
    assert set(got) == set(raw)
    collapsed_any = False
    for d, text in raw.items():
        toks = text.strip().lower().split() if text.strip() else []
        kept = [t for i, t in enumerate(toks)
                if i == 0 or toks[i - 1] != t]
        assert got[d] == (len(toks), len(kept), " ".join(kept)), d
        collapsed_any |= len(kept) < len(toks)
    assert collapsed_any  # the corpus genuinely has repeated runs


def test_collapse_runs_matches_duckdb(spark, ddb):
    s = spark_rows(E.queries()["text_collapse_runs"](spark, SF_DIR))
    d = duckdb_rows(ddb, E.oracle_sql()["text_collapse_runs"])
    assert s == d


def test_scrub_pii_matches_duckdb_and_redacts(spark, ddb):
    s = spark_rows(E.queries()["text_scrub_pii"](spark, SF_DIR))
    d = duckdb_rows(ddb, E.oracle_sql()["text_scrub_pii"])
    assert s == d
    rows = E.queries()["text_scrub_pii"](spark, SF_DIR).collect()
    injected = [r for r in rows if r["doc_id"] % 13 == 0]
    assert injected
    for r in injected:
        assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (1, 1, 1)
        assert "<EMAIL>" in r["clean_text"]
        assert "<IP>" in r["clean_text"]
        assert "<PHONE>" in r["clean_text"]
        # nothing PII-shaped survives redaction
        assert not re.search(cl.EMAIL_RE, r["clean_text"])
        assert not re.search(cl.PHONE_RE, r["clean_text"])
    for r in rows:
        if r["doc_id"] % 13 != 0:
            assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (0, 0, 0)


def test_cleaning_is_shuffle_free(spark):
    docs = E._aug(spark, SF_DIR)
    assert plan_summary(cl.collapse_token_runs(docs))["exchanges"] == 0
    assert plan_summary(cl.scrub_pii(docs))["exchanges"] == 0
