"""Oracle result-type whitelist.

The driver's CORRECTNESS hash is sensitive to the *logical type* of each
oracle column, not just its Python value.  DuckDB silently widens integer
window aggregates (``SUM(BIGINT)`` -> HUGEINT) and integer division of a
HUGEINT stays HUGEINT, so an uncast derivation value-matches locally but
breaks the driver hash (round-5 `pipeline_pack_sequences` regression).

This test runs every ``oracle_sql()`` statement through DuckDB at sf0.001
and asserts every result column's type is in the hash-safe whitelist.  If a
new oracle legitimately needs another type (DATE, TIMESTAMP, ...), extend
the whitelist deliberately — never let HUGEINT/DECIMAL through uncast.
"""
from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

# Types the driver hash round-trips identically between Spark and DuckDB.
HASH_SAFE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT",
                   "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN"}

NAMES = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", NAMES)
def test_oracle_result_types_are_hash_safe(ddb, name):
    sql = entrymod.oracle_sql()[name]
    rel = ddb.sql(sql)
    bad = [
        f"{col}: {ty}"
        for col, ty in zip(rel.columns, rel.types)
        if str(ty) not in HASH_SAFE_TYPES
    ]
    assert not bad, (
        f"{name}: oracle columns with non-hash-safe DuckDB types {bad} — "
        f"add an explicit CAST (e.g. CAST(x AS BIGINT)) in oracles"
    )
