"""tfidf_keywords and drop_boilerplate_lines: semantics against tiny
hand-computed fixtures (the corpus-scale DuckDB differential runs via
tests/test_driver_parity on the driver entries)."""

from __future__ import annotations

import pytest

from public_transit_data_platform_sql_nosql_spark.pipeline.cleaning import (
    drop_boilerplate_lines,
)
from public_transit_data_platform_sql_nosql_spark.pipeline.text import (
    search_bm25,
    tfidf_keywords,
)


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_ranks_rare_over_common(spark):
    # 'common' appears in every doc (df=4 -> tiny idf); 'rare' only in
    # doc 0.  Even at tf 1 vs 3, rare must outrank common.
    rows = [
        (0, "rare common common common"),
        (1, "common"),
        (2, "common"),
        (3, "common"),
    ]
    out = tfidf_keywords(docs_df(spark, rows), top_k=2).collect()
    d0 = sorted([r for r in out if r.doc_id == 0], key=lambda r: r.kw_rank)
    assert [r.token for r in d0] == ["rare", "common"]
    # score formula check: tf * (N - df + 0.5) / (df + 0.5)
    assert d0[0].score == 1.0 * (4 - 1 + 0.5) / (1 + 0.5)
    assert d0[0].tf == 1 and d0[0].df == 1


def test_tfidf_tiebreak_and_topk(spark):
    rows = [(0, "b a c"), (1, "x")]
    out = tfidf_keywords(docs_df(spark, rows), top_k=2).collect()
    d0 = sorted([r for r in out if r.doc_id == 0], key=lambda r: r.kw_rank)
    # equal tf and df -> equal score -> token ASC tiebreak, top_k caps
    assert [r.token for r in d0] == ["a", "b"]


def test_tfidf_empty_docs_produce_no_rows(spark):
    rows = [(0, ""), (1, "word")]
    out = tfidf_keywords(docs_df(spark, rows), top_k=3).collect()
    assert {r.doc_id for r in out} == {1}


def test_line_dedup_drops_hot_keeps_order(spark):
    boiler = "subscribe now"
    rows = [
        (0, f"alpha\n{boiler}\nomega"),
        (1, f"{boiler}\nbravo"),
        (2, f"charlie\n{boiler}"),
        (3, "delta"),
    ]
    out = {r.doc_id: r for r in
           drop_boilerplate_lines(docs_df(spark, rows), min_df=3).collect()}
    assert out[0].clean_text == "alpha\nomega"
    assert out[0].n_lines == 3 and out[0].n_removed == 1
    assert out[1].clean_text == "bravo"
    assert out[2].clean_text == "charlie"
    assert out[3].clean_text == "delta" and out[3].n_removed == 0


def test_line_dedup_below_min_df_kept(spark):
    rows = [(0, "dup\na"), (1, "dup\nb"), (2, "c")]
    out = {r.doc_id: r.clean_text for r in
           drop_boilerplate_lines(docs_df(spark, rows), min_df=3).collect()}
    assert out[0] == "dup\na"  # df=2 < 3 -> kept


def test_line_dedup_intra_doc_repeat_counts_once(spark):
    # the same line 3x inside ONE doc is df=1 (distinct docs), not hot
    rows = [(0, "x\nx\nx"), (1, "y")]
    out = {r.doc_id: r for r in
           drop_boilerplate_lines(docs_df(spark, rows), min_df=3).collect()}
    assert out[0].clean_text == "x\nx\nx" and out[0].n_removed == 0


def test_line_dedup_all_removed_keeps_row(spark):
    rows = [(0, "ad"), (1, "ad"), (2, "ad"), (3, "keep")]
    out = {r.doc_id: r for r in
           drop_boilerplate_lines(docs_df(spark, rows), min_df=3).collect()}
    assert out[0].clean_text == "" and out[0].n_removed == 1
    assert out[3].clean_text == "keep"


def test_line_dedup_rejects_min_df_one(spark):
    with pytest.raises(ValueError):
        drop_boilerplate_lines(docs_df(spark, [(0, "a")]), min_df=1)


def bm25_py(rows, terms, k1=1.2, b=0.75):
    import math

    docs = {i: t.lower().split() for i, t in rows if t.strip()}
    docs.update({i: [] for i, t in rows if not t.strip()})
    n = len(rows)
    avgdl = sum(len(v) for v in docs.values()) / n
    df = {t: sum(1 for v in docs.values() if t in v) for t in terms}
    out = {}
    for i, v in docs.items():
        s, hits = 0, 0
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            hits += 1
            idf = (n - df[t] + 0.5) / (df[t] + 0.5)
            ts = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * (len(v) / avgdl)))
            s += math.floor(ts * 1000000.0)
        if hits:
            out[i] = (hits, s)
    return out


def test_bm25_matches_python_mirror(spark):
    rows = [
        (0, "spark merge spark window"),
        (1, "merge merge merge"),
        (2, "window"),
        (3, "nothing relevant here at all and quite long too yes"),
        (4, "spark"),
    ]
    got = {r.doc_id: (r.n_terms_hit, r.score_micro)
           for r in search_bm25(docs_df(spark, rows),
                                ["spark", "window", "merge"]).collect()}
    assert got == bm25_py(rows, ["spark", "window", "merge"])


def test_bm25_ranks_multi_term_doc_first(spark):
    rows = [
        (0, "spark window merge"),
        (1, "spark spark spark spark"),
        (2, "other words only"),
    ]
    out = search_bm25(docs_df(spark, rows),
                      ["spark", "window", "merge"], top_k=2).collect()
    assert out[0].doc_id == 0 and out[0].n_terms_hit == 3
    assert {r.doc_id for r in out} == {0, 1}


def test_bm25_plan_shape(spark):
    # top-k must plan as TakeOrderedAndProject (no global sort); the
    # constant-key scalar joins must broadcast, never go cartesian
    from public_transit_data_platform_sql_nosql_spark.plans import (
        executed_plan,
        plan_summary,
    )

    rows = [(0, "spark window"), (1, "merge")]
    df = search_bm25(docs_df(spark, rows), ["spark", "window", "merge"])
    plan = executed_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    s = plan_summary(df)
    assert s["cartesian_products"] == 0


def test_line_dedup_plan_no_cartesian(spark):
    from public_transit_data_platform_sql_nosql_spark.plans import (
        plan_summary,
    )

    df = drop_boilerplate_lines(docs_df(spark, [(0, "a\nb"), (1, "a")]))
    assert plan_summary(df)["cartesian_products"] == 0


def test_bm25_query_terms_lowercased_and_validated(spark):
    rows = [(0, "Spark is HERE")]
    out = search_bm25(docs_df(spark, rows), ["SPARK"]).collect()
    assert len(out) == 1 and out[0].n_terms_hit == 1
    with pytest.raises(ValueError):
        search_bm25(docs_df(spark, rows), [])


def test_hybrid_search_rejects_missing_query_vector(spark):
    import __spark_entry__ as E
    from public_transit_data_platform_sql_nosql_spark.pipeline.text import (
        hybrid_search,
    )
    from tests.conftest import SF_DIR

    with pytest.raises(ValueError, match="not in emb"):
        hybrid_search(E._aug(spark, SF_DIR), E._emb(spark, SF_DIR),
                      ["spark"], query_vec_id=10**9)


# --- bigram LM fluency scoring --------------------------------------------


def _lm_mirror(texts):
    """Literal Python recomputation of lm_transition_scores."""
    from collections import Counter

    toks = {i: t.lower().split() for i, t in enumerate(texts)}
    uni = Counter(w for tt in toks.values() for w in tt)
    big = Counter(
        (tt[i], tt[i + 1])
        for tt in toks.values() for i in range(len(tt) - 1))
    v = len(uni)
    out = {}
    for doc_id, tt in toks.items():
        micros = [
            big[(tt[i], tt[i + 1])] * 1_000_000 // (uni[tt[i]] + v)
            for i in range(len(tt) - 1)
        ]
        out[doc_id] = (len(micros),
                       sum(micros) // len(micros) if micros else None)
    return out


def test_lm_score_matches_python_mirror(spark):
    """Randomized small-vocab corpus against the literal mirror."""
    import numpy as np

    from public_transit_data_platform_sql_nosql_spark.pipeline.text import (
        lm_transition_scores,
    )

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(9)]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(0, 25))))
             for _ in range(40)] + ["solo", ""]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_transitions"], r["lm_score_micro"])
           for r in lm_transition_scores(docs).collect()}
    assert got == _lm_mirror(texts)


def test_lm_score_ranks_fluent_above_shuffled(spark):
    """The signal does its job: text made of the corpus's common
    transitions outscores the same words in a never-seen order."""
    from public_transit_data_platform_sql_nosql_spark.pipeline.text import (
        lm_transition_scores,
    )

    base = ["the cat sat on the mat"] * 10
    fluent = "the cat sat on the mat"
    shuffled = "mat the on cat the sat"
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(base + [fluent, shuffled])],
        "doc_id long, text string")
    got = {r["doc_id"]: r["lm_score_micro"]
           for r in lm_transition_scores(docs).collect()}
    assert got[10] > got[11]


def test_lm_score_no_evidence_is_null(spark):
    from public_transit_data_platform_sql_nosql_spark.pipeline.text import (
        lm_transition_scores,
    )

    docs = spark.createDataFrame(
        [(0, "word"), (1, ""), (2, "two words")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_transitions"], r["lm_score_micro"])
          for r in lm_transition_scores(docs).collect()}
    assert got[0] == (0, None)
    assert got[1] == (0, None)
    assert got[2][0] == 1 and got[2][1] is not None
