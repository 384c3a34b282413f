"""Curation operators: hash-split stability, stratified-cap contract,
chunking coverage — plus the plan shapes that make them scale (split and
chunking shuffle-free, cap's count side broadcast)."""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as E
from public_transit_data_platform_sql_nosql_spark.pipeline import (
    curation as cur,
)
from public_transit_data_platform_sql_nosql_spark.plans import plan_summary
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return E._aug(spark, SF_DIR)


def test_split_is_stable_under_corpus_changes(docs):
    """Membership is a function of doc_id alone: removing half the corpus
    must not flip anyone else's split — the property that prevents eval
    contamination across corpus rebuilds."""
    full = {r["doc_id"]: r["split"]
            for r in cur.split_assign(docs).collect()}
    half = {r["doc_id"]: r["split"]
            for r in cur.split_assign(
                docs.filter("doc_id % 2 = 0")).collect()}
    assert half and all(full[k] == v for k, v in half.items())
    # both splits populated at the default 10%
    frac = sum(1 for v in full.values() if v == "val") / len(full)
    assert 0.02 < frac < 0.25


def test_split_and_chunking_are_shuffle_free(docs):
    assert plan_summary(cur.split_assign(docs))["exchanges"] == 0
    assert plan_summary(cur.chunk_tokens(docs))["exchanges"] == 0


def test_stratified_cap_contract(docs):
    cap = 10
    group_sizes = {r["lang"]: r["count"]
                   for r in docs.groupBy("lang").count().collect()}
    rows = cur.stratified_cap(docs, cap=cap).collect()
    by_grp: dict[str, list] = {}
    for r in rows:
        by_grp.setdefault(r["lang"], []).append(r)
    assert set(by_grp) == set(group_sizes)
    for grp, members in by_grp.items():
        assert len(members) == min(group_sizes[grp], cap)
        ranks = sorted(r["sample_rank"] for r in members)
        assert ranks == list(range(1, len(members) + 1))
    # the count side must broadcast (prefilter stage), and the kept set
    # must be deterministic across runs
    assert plan_summary(
        cur.stratified_cap(docs, cap=cap))["broadcast_hash_joins"] >= 1
    again = {r["doc_id"] for r in cur.stratified_cap(docs, cap=cap).collect()}
    assert again == {r["doc_id"] for r in rows}


def test_chunk_tokens_coverage(docs):
    step = cur.CHUNK_SIZE - cur.CHUNK_OVERLAP
    n_toks = {
        r["doc_id"]: len(r["text"].lower().strip().split())
        for r in docs.select("doc_id", "text").collect()
    }
    chunks: dict[int, list] = {}
    for r in cur.chunk_tokens(docs).collect():
        chunks.setdefault(r["doc_id"], []).append(r)
    for doc_id, n in n_toks.items():
        got = sorted(chunks.get(doc_id, []), key=lambda r: r["chunk_idx"])
        if n == 0:
            assert not got
            continue
        assert [r["chunk_idx"] for r in got] == list(
            range(math.ceil(n / step)))
        for r in got:
            start = r["chunk_idx"] * step
            assert r["n_chunk_tokens"] == min(start + cur.CHUNK_SIZE, n) - start
        # consecutive chunks overlap by CHUNK_OVERLAP tokens (until the
        # tail), so every token is covered at least once
        assert got[-1]["chunk_idx"] * step + got[-1]["n_chunk_tokens"] == n


def test_chunk_tokens_boundary_sizes(spark):
    """The integer ceil-division chunk count at exact window boundaries:
    n = 1, step-1, step, step+1, size, size+1, 2*size, and a co-prime
    size — chunk indices dense, sizes exact, full coverage."""
    step = cur.CHUNK_SIZE - cur.CHUNK_OVERLAP
    sizes = [1, step - 1, step, step + 1, cur.CHUNK_SIZE,
             cur.CHUNK_SIZE + 1, 2 * cur.CHUNK_SIZE, 317]
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(n)))
         for i, n in enumerate(sizes)],
        "doc_id long, text string")
    by_doc: dict[int, list] = {}
    for r in cur.chunk_tokens(docs).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, n in enumerate(sizes):
        got = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        assert [r["chunk_idx"] for r in got] == list(
            range(math.ceil(n / step))), (i, n)
        for r in got:
            start = r["chunk_idx"] * step
            assert r["n_chunk_tokens"] == min(
                start + cur.CHUNK_SIZE, n) - start, (i, n)
        assert got[-1]["chunk_idx"] * step + got[-1]["n_chunk_tokens"] == n


def test_vocabulary_matches_python_counter(spark, docs):
    """Corpus vocabulary equals an independent Python count, ranks by
    (count desc, token asc), and the top-k path plans as
    TakeOrderedAndProject (no global sort)."""
    from collections import Counter

    from public_transit_data_platform_sql_nosql_spark.pipeline.text import (
        vocabulary,
    )

    counts: Counter = Counter()
    for r in docs.select("text").collect():
        counts.update(r["text"].lower().strip().split())
    got = [(r["token"], r["n_occurrences"])
           for r in vocabulary(docs, top_k=25).collect()]
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    assert got == want
    assert plan_summary(vocabulary(docs, top_k=25))[
        "take_ordered_and_project"]


def test_training_chunks_end_to_end(spark, docs):
    """docs -> training sequences: surviving chunks come only from
    curated, non-contaminated docs; every repeated window keeps exactly
    its canonical copy; the whole pass is one closed plan (no cartesian,
    no driver hops)."""
    from pyspark.sql import functions as F

    from public_transit_data_platform_sql_nosql_spark.pipeline import (
        dedup as pd_,
    )
    from public_transit_data_platform_sql_nosql_spark.pipeline import (
        text as pt,
    )

    labels = pd_.dedup_clusters(pd_.minhash_lsh_pairs(docs))
    quality = pt.quality_scores(docs)
    decont = pd_.decontaminate_report(
        docs.filter("doc_id % 11 != 0"), docs.filter("doc_id % 11 = 0"))
    out = cur.training_chunks(docs, labels, quality,
                              decont_report=decont).persist()
    assert out.count() > 0
    kept_docs = {r["doc_id"] for r in
                 cur.curated_corpus(docs, labels, quality)
                 .join(decont.select("doc_id"), "doc_id", "left_anti")
                 .collect()}
    assert {r["doc_id"] for r in out.select("doc_id").distinct().collect()
            } <= kept_docs
    # repeated windows: exactly ONE surviving row per corpus-repeated
    # chunk_hash — across docs AND within the canonical doc
    dup_counts = (out.groupBy("chunk_hash")
                  .agg(F.count(F.lit(1)).alias("n")).collect())
    boiler = {r["chunk_hash"] for r in
              cur.chunk_dedup(cur.chunk_tokens(
                  docs.join(
                      spark.createDataFrame(
                          [(d,) for d in kept_docs], "doc_id long"),
                      "doc_id", "left_semi"))).collect()}
    for r in dup_counts:
        if r["chunk_hash"] in boiler:
            assert r["n"] == 1
    s = plan_summary(cur.training_chunks(docs, labels, quality))
    assert s["cartesian_products"] == 0
    out.unpersist()


def test_pack_sequences_matches_naive(spark, docs):
    """pack_sequences vs a brute-force python packer over the same chunk
    rows: identical (doc, seq) membership and totals; sequences are
    contiguous chunk runs; every non-final sequence reaches the budget;
    and the whole thing plans with ONE exchange (the groupBy reuses the
    window's doc_id partitioning)."""
    budget = 160
    chunks = cur.chunk_tokens(docs)
    rows = sorted(
        ((r["doc_id"], r["chunk_idx"], r["n_chunk_tokens"])
         for r in chunks.collect()))
    want: dict[tuple, list] = {}
    cum: dict = {}
    for doc, idx, n in rows:
        c = cum.get(doc, 0)
        want.setdefault((doc, c // budget), []).append((idx, n))
        cum[doc] = c + n
    packed = cur.pack_sequences(chunks, token_budget=budget)
    got = {(r["doc_id"], r["seq_idx"]):
           (r["n_chunks"], r["seq_tokens"],
            r["first_chunk_idx"], r["last_chunk_idx"])
           for r in packed.collect()}
    assert set(got) == set(want)
    for key, members in want.items():
        idxs = [i for i, _ in members]
        total = sum(n for _, n in members)
        assert got[key] == (len(members), total, min(idxs), max(idxs))
        assert max(idxs) - min(idxs) + 1 == len(members)  # contiguous
    # non-final sequences meet the budget (padding only at doc tails)
    finals = {doc: max(s for d, s in want if d == doc) for doc, _ in want}
    for (doc, seq), (_, total, _, _) in got.items():
        if seq != finals[doc]:
            assert total >= budget
    # plan-shape assertion on a FRESH (unexecuted) frame: a finalized
    # AQE plan string duplicates its exchanges (stage + initial-plan
    # sections), so count before any action runs
    fresh = plan_summary(cur.pack_sequences(cur.chunk_tokens(docs),
                                            token_budget=budget))
    assert fresh["exchanges"] == 1
    # ...and that one exchange keys on doc_id alone: the groupBy reuses
    # the window's partitioning instead of re-shuffling on (doc, seq)
    from public_transit_data_platform_sql_nosql_spark.plans import (
        executed_plan,
    )

    plan = executed_plan(cur.pack_sequences(cur.chunk_tokens(docs),
                                            token_budget=budget))
    import re

    assert all(part.startswith("doc_id")
               for part in re.findall(r"hashpartitioning\((\w+)", plan))


def test_training_sequences_composition_matches_oracle(spark, ddb):
    """The end-to-end docs -> packed-training-sequences composition
    (training_chunks piped into pack_sequences) against its composed
    DuckDB oracle."""
    from tests.conftest import duckdb_rows, spark_rows

    name = "pipeline_training_sequences"
    s = spark_rows(E.queries()[name](spark, SF_DIR))
    d = duckdb_rows(ddb, E.oracle_sql()[name])
    assert s == d
    # every packed sequence except a doc's last must reach the budget
    rows = E.queries()[name](spark, SF_DIR).collect()
    last = {}
    for r in rows:
        last[r["doc_id"]] = max(last.get(r["doc_id"], -1), r["seq_idx"])
    for r in rows:
        if r["seq_idx"] != last[r["doc_id"]]:
            assert r["seq_tokens"] >= 160


def _ffd_mirror(pairs, budget):
    """The same deterministic FFD in plain python: pairs = [(chunk_idx,
    tokens)]; returns [(n_chunks, seq_tokens)] ordered like the op."""
    pairs = sorted(pairs, key=lambda p: (-p[1], p[0]))
    bins = []
    for idx, t in pairs:
        for b in bins:
            if b[0] + t <= budget:
                b[0] += t
                b[1] += 1
                break
        else:
            bins.append([t, 1, idx])
    bins.sort(key=lambda b: (-b[0], b[2]))
    return [(b[1], b[0]) for b in bins]


def test_pack_sequences_ffd_matches_python_mirror(spark, docs):
    """Exact differential: the applyInPandas FFD equals a plain-python
    mirror per doc (deterministic), token totals are preserved, and no
    sequence exceeds the budget except single oversize chunks."""
    budget = 160
    chunks = cur.chunk_tokens(docs)
    per_doc: dict = {}
    for r in chunks.collect():
        per_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_chunk_tokens"]))

    rows = cur.pack_sequences_ffd(chunks, token_budget=budget).collect()
    got: dict = {}
    for r in rows:
        got.setdefault(r["doc_id"], {})[r["seq_idx"]] = (
            r["n_chunks"], r["seq_tokens"])
        assert r["seq_tokens"] <= budget or r["n_chunks"] == 1, (
            r["doc_id"], r["seq_idx"])
    assert set(got) == set(per_doc)
    for d, pairs in per_doc.items():
        want = _ffd_mirror(pairs, budget)
        assert [got[d][i] for i in sorted(got[d])] == want, d
        assert sum(t for _, t in got[d].values()) == sum(
            t for _, t in pairs)


def test_pack_sequences_ffd_respects_cap_where_greedy_overflows(spark):
    """[60, 60, 40, 40] @ budget 100: greedy's prefix-sum split yields
    an overflowing 120-token sequence; FFD repacks to two EXACT-budget
    sequences — the hard-cap contract is the operator's point."""
    rows = [(1, 0, 60), (1, 1, 60), (1, 2, 40), (1, 3, 40)]
    chunks = spark.createDataFrame(
        rows, "doc_id long, chunk_idx long, n_chunk_tokens long")
    ffd = cur.pack_sequences_ffd(chunks, token_budget=100).collect()
    assert sorted(r["seq_tokens"] for r in ffd) == [100, 100]
    greedy = cur.pack_sequences(chunks, token_budget=100).collect()
    assert max(r["seq_tokens"] for r in greedy) == 120  # overshoot
    with pytest.raises(ValueError, match="positive"):
        cur.pack_sequences_ffd(chunks, token_budget=0)
