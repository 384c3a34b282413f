"""Hypothesis properties for the r8 operators' pure-Python cores —
no SparkSession needed, so thousands of cases run in seconds.  The
Spark/DuckDB differentials pin the distributed implementations; these
pin the ALGEBRA they rely on (BPE fold invariants, greedy-batch
soundness, the KMV merge law, URL-suffix structure)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from public_transit_data_platform_sql_nosql_spark.pipeline.bpe import (
    BPE_REGEX,
    MERGES,
    _greedy_batch,
    _table_is_sequential_safe,
    bpe_encode,
    learn_merges_py,
)

texts = st.text(
    alphabet=st.sampled_from("abcdefghij012 .?!-"), max_size=80)


@given(texts)
def test_bpe_concat_invariant(t):
    """Merging never loses or invents characters: the concatenation of
    the subword tokens equals the concatenation of the pre-split
    pieces of lower(t)."""
    assert "".join(bpe_encode(t)) == "".join(
        re.findall(BPE_REGEX, t.lower()))


@given(texts)
def test_bpe_tokens_are_nonempty_and_covered(t):
    for tok in bpe_encode(t):
        assert tok != ""


@given(texts, st.integers(min_value=1, max_value=8),
       st.integers(min_value=1, max_value=6))
@settings(max_examples=40, deadline=None)
def test_learned_tables_are_valid_and_sequential_safe(t, n, batch):
    """Whatever the trainer learns (any batch size) is a VALID table —
    every multi-char side formed by an earlier merge — and
    sequential-safe, so the scaled encoder's fast path applies."""
    merges = [(a, b) for _, a, b, _, _ in
              learn_merges_py([t, t + " extra pad"], n, batch=batch)]
    formed = set()
    for a, b in merges:
        for side in (a, b):
            assert len(side) == 1 or side in formed, (merges, side)
        formed.add(a + b)
    assert _table_is_sequential_safe(merges)


@given(st.lists(st.tuples(st.text("abc", min_size=1, max_size=3),
                          st.text("abc", min_size=1, max_size=3),
                          st.integers(min_value=1, max_value=99)),
                max_size=20),
       st.integers(min_value=1, max_value=5))
def test_greedy_batch_is_disjoint_prefix_respecting(rows, batch):
    taken = _greedy_batch(rows, batch)
    assert len(taken) <= batch
    seen: set = set()
    for a, b, _ in taken:
        assert not ({a, b, a + b} & seen)
        seen |= {a, b, a + b}
    # order preserved: taken is a subsequence of rows
    it = iter([(a, b) for a, b, _ in rows])
    assert all(any((a, b) == x for x in it) for a, b, _ in taken)


@given(st.lists(st.integers(min_value=0, max_value=10**9), max_size=200),
       st.lists(st.integers(min_value=0, max_value=10**9), max_size=200),
       st.integers(min_value=1, max_value=32))
def test_kmv_merge_law(a, b, k):
    """kmin(A ∪ B) == kmin(kmin(A) ∪ kmin(B)) — the exact-merge law
    stream_kmv_cardinality is built on."""
    def kmin(s):
        return sorted(set(s))[:k]

    assert kmin(a + b) == kmin(kmin(a) + kmin(b))


@given(st.lists(st.sampled_from(
    ["a", "b", "m0", "mid", "example", "org", "net"]),
    min_size=1, max_size=5))
def test_host_suffix_structure(labels):
    """The python mirror of host_suffixes: |suffixes| == |labels| and
    each drops exactly one leading label."""
    host = ".".join(labels)
    sfx = [".".join(labels[i:]) for i in range(len(labels))]
    assert len(sfx) == len(labels)
    for i in range(1, len(sfx)):
        assert sfx[i - 1] == labels[i - 1] + "." + sfx[i]


def test_shipped_table_is_sequential_safe():
    assert _table_is_sequential_safe(MERGES)
