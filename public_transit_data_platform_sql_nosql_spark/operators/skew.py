"""Skew-resistant join: explicit key salting as a reusable operator.

AQE's skew-join handling (on in session.py) splits oversized SHUFFLE
partitions at runtime and is the first tool to reach for.  It cannot
help when the skew is in the JOIN KEY itself and the plan is a
sort-merge join both of whose sides put a hot key's every row into one
task — or when a deterministic, planner-independent layout is needed
(e.g. a job that must behave identically across Spark versions/configs).
``salted_join`` is the classic manual remedy, packaged once instead of
re-derived per pipeline:

  big side:    salt = hash(entire row) % n_salt    (deterministic, no
               rand() — retries/speculative tasks recompute the same
               salt, so no row ever double-counts)
  small side:  exploded over ALL n_salt values
  join:        equi-join on (key..., salt)

Every big row meets every matching small row exactly once (through the
single salt copy the big row carries), so inner/left semantics are
preserved for ANY key multiplicity; the hot key's rows spread over
``n_salt`` tasks at the cost of replicating the smaller side n_salt
times — the standard trade, now explicit and testable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_skew_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    n_salt: int = 16,
) -> DataFrame:
    """Join ``big`` to ``small`` on ``on`` with the big side's rows
    spread across ``n_salt`` salt buckets.  ``how`` is ``inner`` or
    ``left`` (semantics where replication is safe; right/full would
    duplicate small-side unmatched rows per salt).

    The salt hashes the big side's FULL row (xxhash64), so it is
    deterministic under retries and spreads a hot key's rows across
    salts whichever columns carry the skew — with one limit: rows that
    are IDENTICAL in every column hash to the same salt, so skew caused
    by exact duplicate rows is not spread (there is no deterministic
    way to distinguish copies; dedupe-and-count upstream, or carry a
    unique row id into the hash, when exact duplicates are expected).
    Cost model: small side bytes x n_salt extra shuffle volume buys the
    hot key n_salt-way parallelism — size n_salt to the worst key's
    share of a task, not higher."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if _SALT in big.columns or _SALT in small.columns:
        raise ValueError(f"inputs must not carry a {_SALT} column")
    salted_big = big.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
               F.lit(n_salt)).cast("int"),
    )
    replicated_small = small.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>")),
    )
    return (
        salted_big.join(replicated_small, [*keys, _SALT], how)
        .drop(_SALT)
    )
