"""repeated_spans / drop_repeated_spans: planted-span boundary checks, a
brute-force Python mirror on randomized corpora, and plan-shape guards.

The operator marks every position whose k-token window occurs >= 2 times
corpus-wide and merges consecutive marked positions into maximal spans —
the distributed re-shape of the suffix-array exact dedup (Lee et al.
2022); the mirror here recomputes that definition literally.
"""

from __future__ import annotations

import numpy as np
import pytest

from public_transit_data_platform_sql_nosql_spark.pipeline.dedup import (
    REPEAT_SPAN_K,
    drop_repeated_spans,
    positional_shingles,
    repeated_spans,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _mirror_spans(texts, k):
    """Literal Python recomputation: count k-gram occurrences, mark, merge."""
    toks = [t.lower().split() for t in texts]
    from collections import Counter

    occ = Counter(
        tuple(tt[i:i + k])
        for tt in toks for i in range(len(tt) - k + 1))
    out = []
    for doc_id, tt in enumerate(toks):
        marked = [i + 1 for i in range(len(tt) - k + 1)
                  if occ[tuple(tt[i:i + k])] >= 2]
        run = []
        for p in marked:
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    out.append((doc_id, run[0], run[-1] + k - 1))
                run = [p]
        if run:
            out.append((doc_id, run[0], run[-1] + k - 1))
    return sorted(out)


def _mirror_drop(texts, k):
    spans = _mirror_spans(texts, k)
    out = []
    for doc_id, t in enumerate(texts):
        tt = t.lower().split()
        covered = set()
        for d, s, e in spans:
            if d == doc_id:
                covered.update(range(s, e + 1))
        kept = [tok for i, tok in enumerate(tt, start=1)
                if i not in covered]
        out.append((doc_id, len(tt), len(kept), " ".join(kept)))
    return sorted(out)


def test_planted_span_boundaries(spark):
    """Two docs share an 10-token block embedded at different offsets;
    the span covers EXACTLY the shared block in each doc (k=8)."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    a = "x1 x2 x3 " + shared + " y1 y2"         # shared at pos 4..13
    b = "z1 " + shared + " w1 w2 w3 w4 w5"      # shared at pos 2..11
    c = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in repeated_spans(_docs(spark, [a, b, c]), k=8).collect())
    assert got == [(0, 4, 13, 10), (1, 2, 11, 10)]


def test_intra_doc_repeat_marked(spark):
    """A k-gram repeated WITHIN one doc (nowhere else) still marks both
    occurrences — occurrence semantics, not distinct-doc semantics."""
    block = "p1 p2 p3 p4 p5 p6 p7 p8"
    t = block + " mid1 mid2 " + block
    got = sorted(
        (r["span_start"], r["span_end"])
        for r in repeated_spans(_docs(spark, [t]), k=8).collect())
    assert got == [(1, 8), (11, 18)]


def test_short_docs_contribute_nothing(spark):
    """Docs under k tokens produce no positional shingles and no spans,
    and survive drop_repeated_spans untouched."""
    texts = ["a b c", "a b c", ""]
    assert repeated_spans(_docs(spark, texts), k=8).count() == 0
    got = sorted(
        (r["doc_id"], r["n_tokens_before"], r["n_tokens_after"],
         r["clean_text"])
        for r in drop_repeated_spans(_docs(spark, texts), k=8).collect())
    assert got == [(0, 3, 3, "a b c"), (1, 3, 3, "a b c"), (2, 0, 0, "")]


def test_whole_doc_duplicate_fully_cut(spark):
    t = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"
    got = {r["doc_id"]: (r["n_tokens_after"], r["clean_text"])
           for r in drop_repeated_spans(_docs(spark, [t, t]), k=8).collect()}
    assert got == {0: (0, ""), 1: (0, "")}


@pytest.mark.parametrize("seed", [3, 17])
def test_random_corpus_vs_python_mirror(spark, seed):
    """Randomized small-vocab corpora (repeats arise naturally) against
    the literal Python mirror, spans AND the rewritten corpus."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(4, 40))))
        for _ in range(30)
    ]
    # plant a shared block in a third of the docs to guarantee positives
    block = " ".join(rng.choice(vocab, size=10))
    texts = [t + " " + block if i % 3 == 0 else t
             for i, t in enumerate(texts)]
    df = _docs(spark, texts)
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in repeated_spans(df, k=REPEAT_SPAN_K).collect())
    assert got == _mirror_spans(texts, REPEAT_SPAN_K)
    got_drop = sorted(
        (r["doc_id"], r["n_tokens_before"], r["n_tokens_after"],
         r["clean_text"])
        for r in drop_repeated_spans(df, k=REPEAT_SPAN_K).collect())
    assert got_drop == _mirror_drop(texts, REPEAT_SPAN_K)


def test_positional_shingles_count(spark):
    """n - k + 1 shingles per doc of n >= k tokens, with 1-based pos."""
    t = " ".join(f"t{i}" for i in range(12))
    rows = positional_shingles(_docs(spark, [t]), k=8).collect()
    assert sorted(r["pos"] for r in rows) == list(range(1, 6))


def test_plan_no_cartesian(spark):
    from public_transit_data_platform_sql_nosql_spark.plans import (
        plan_summary,
    )

    texts = [" ".join(f"w{i % 5}" for i in range(20))] * 4
    s = plan_summary(repeated_spans(_docs(spark, texts)))
    assert s["cartesian_products"] == 0
    s2 = plan_summary(drop_repeated_spans(_docs(spark, texts)))
    assert s2["cartesian_products"] == 0
