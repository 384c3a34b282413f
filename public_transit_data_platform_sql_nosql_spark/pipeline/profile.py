"""One-pass table profiling: per-column row/null/distinct counts and
min/max — the stats pass a 100 TB pipeline runs before planning a
backfill (partition sizing, skew discovery, quality monitoring).

``table_profile`` is EXACT (count-distinct per column) and DuckDB
oracle-checked; ``approx_profile`` swaps the distinct counts for HLL++
sketches (``approx_count_distinct``) — the scale path, where the exact
variant's per-column distinct aggregation would shuffle every value and
the sketch keeps the whole profile a single map-side-combinable pass of
fixed memory.  Both profile every requested column in ONE aggregation
over ONE scan (the per-column stats are parallel aggregate expressions,
then the single result row unpivots via ``stack``), so profiling never
multiplies reads of the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .core import P, md5_hash64

KMV_K = 64
# the hash space IS md5_hash64's modulus: estimates divide by the k-th
# minimum's quantile position in [0, P)
KMV_SPACE = P


def kmv_distinct(df: DataFrame, columns: list[str] | None = None,
                 k: int = KMV_K) -> DataFrame:
    """Deterministic cardinality sketch per column: K-Minimum-Values
    (Bar-Yossef et al.) on the md5 hash — ``(column, n_sketch,
    kth_hash, est_distinct)``.

    HLL (``approx_profile``) is the fixed-memory scale path, but its
    register layout is engine-private, so it can only be rows-checked.
    KMV is the sketch you can ORACLE: the estimate is a pure integer
    function of the k smallest distinct hash values —

        est = (k-1) * SPACE DIV kth_smallest      (sketch full)
        est = |distinct hashes seen|              (under k: exact)

    — and both engines compute the identical md5-derived hashes, so the
    driver hash-compares every row (stderr ~ 1/sqrt(k-2) ~= 13% at
    k=64; the pytest pins the bound against exact counts).  Hashes live
    in [0, P ~ 1e9): small enough that (k-1)*P stays far inside int64,
    large enough that corpus-scale collisions are rare — and collisions
    are engine-identical anyway, so parity never breaks.

    Shape per column: one NARROW scan (column pruning reads just that
    column), a map-side-combined distinct on the hash (the exchange
    carries distinct int32-sized hashes, not values — the one shuffle
    that makes the k-th MINIMUM exact across partitions), then
    orderBy+limit k plans as TakeOrderedAndProject (per-partition heaps
    + driver merge, never a global sort).  Columns union at the end —
    n_cols independent narrow plans, not one wide scan.
    """
    cols = columns if columns is not None else df.columns
    outs = []
    for c in cols:
        h = md5_hash64(F.col(c).cast("string"))
        sketch = (
            df.where(F.col(c).isNotNull())
            .select(h.alias("h"))
            .groupBy("h").agg(F.lit(1))
            .orderBy("h")
            .limit(k)
        )
        outs.append(
            sketch.agg(
                F.count(F.lit(1)).cast("long").alias("n_sketch"),
                F.max("h").cast("long").alias("kth_hash"),
            ).select(
                F.lit(c).alias("column"),
                "n_sketch",
                "kth_hash",
                F.when(
                    F.col("n_sketch") < k, F.col("n_sketch")
                ).otherwise(
                    F.expr(f"{(k - 1) * KMV_SPACE} DIV "
                           f"greatest(kth_hash, 1)")
                ).cast("long").alias("est_distinct"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _profile(df: DataFrame, columns: list[str] | None,
             distinct_expr) -> DataFrame:
    cols = columns if columns is not None else df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            distinct_expr(c).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `{c}__rows`, `{c}__nulls`, `{c}__distinct`, "
        f"`{c}__min`, `{c}__max`" for c in cols)
    return one.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(column, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )


def table_profile(df: DataFrame,
                  columns: list[str] | None = None) -> DataFrame:
    """Exact profile: one row per column —
    ``(column, n_rows, n_nulls, n_distinct, min_value, max_value)``
    (min/max as strings so heterogeneous columns share one schema;
    string ordering is binary UTF-8 in both Spark and DuckDB, so the
    oracle matches byte-for-byte).  ``count(DISTINCT)`` per column is
    exact but shuffles; prefer ``approx_profile`` at scale.
    """
    return _profile(
        df, columns,
        lambda c: F.count_distinct(F.col(c)).cast("long"))


def approx_profile(df: DataFrame,
                   columns: list[str] | None = None,
                   rsd: float = 0.05) -> DataFrame:
    """Sketch profile: same shape as ``table_profile`` with
    ``n_distinct`` from HLL++ at relative standard deviation ``rsd`` —
    fixed memory per column, single pass, no distinct shuffle."""
    return _profile(
        df, columns,
        lambda c: F.approx_count_distinct(F.col(c), rsd).cast("long"))


def join_key_profile(left: DataFrame, right: DataFrame,
                     keys: list[str] | str,
                     top_n: int = 20) -> DataFrame:
    """Pre-flight profile of an equi-join: per-key row counts on each
    side and the pair count that key would emit — run BEFORE a 100-TB
    join to catch skewed keys and output explosions while they are still
    a cheap aggregate, not a hung stage.  Returns the ``top_n`` keys by
    ``pair_rows`` (ties broken by key ASC so the limit boundary is
    total-ordered): the hot keys are exactly the ones to route through
    operators/skew.salted_join or to pre-aggregate away.

    Scale shape: one map-side-combinable groupBy per side — each count
    table is |distinct keys| rows, never the data — then ONE hash
    full-outer join of the two count tables (null-safe on the keys, so
    null join keys profile like any other value even though an inner
    equi-join would drop them — the profile must SHOW them) and a
    TakeOrdered top-n.  Exact, not a sketch: the count tables are
    already the small side of the problem.
    """
    if isinstance(keys, str):
        keys = [keys]
    lc = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("left_rows"))
    rc = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("right_rows"))
    cond = [lc[k].eqNullSafe(rc[k]) for k in keys]
    joined = lc.join(rc, cond, "full_outer").select(
        *[F.coalesce(lc[k], rc[k]).alias(k) for k in keys],
        F.coalesce("left_rows", F.lit(0)).alias("left_rows"),
        F.coalesce("right_rows", F.lit(0)).alias("right_rows"),
    ).withColumn(
        "pair_rows", F.col("left_rows") * F.col("right_rows"))
    return joined.orderBy(
        F.desc("pair_rows"),
        *[F.asc(F.coalesce(F.col(k).cast("string"), F.lit(""))) for k in
          keys],
    ).limit(top_n)


def join_key_profile_summary(left: DataFrame, right: DataFrame,
                             keys: list[str] | str) -> DataFrame:
    """One-row companion to :func:`join_key_profile`: the estimated
    inner-join output size (``sum(l*r)`` — exact for an equi-join), the
    number of matching keys, and the hottest single key's share of the
    output in permille (integer, cross-engine exact).  A share near
    1000 means one key dominates the join — salt it."""
    if isinstance(keys, str):
        keys = [keys]
    lc = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("l"))
    rc = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("r"))
    pairs = lc.join(rc, keys).select(
        (F.col("l") * F.col("r")).alias("p"))
    return pairs.agg(
        F.coalesce(F.sum("p"), F.lit(0)).cast("long")
        .alias("est_output_rows"),
        F.count(F.lit(1)).alias("n_matching_keys"),
        F.coalesce(
            F.expr("max(p) * 1000 div greatest(sum(p), 1)"), F.lit(0)
        ).cast("long").alias("hottest_key_permille"),
    )


def corpus_report(docs: DataFrame) -> DataFrame:
    """Per-(source, lang) curation dashboard — the rollup a corpus build
    publishes after every refresh: document/emptiness counts, exact-dup
    pressure, token and char volume, and mean heuristic quality per
    slice.  ``(source, lang, n_docs, n_empty, n_dup_texts, sum_tokens,
    mean_tokens, sum_chars, mean_quality_micro)``.

    Engine-exact by construction: per-doc quality (already a 6dp-rounded
    double that hash-compares across engines — text_profile's gate)
    is micro-quantized to an integer BEFORE summation, so group means
    are order-independent DIV arithmetic, never a float sum.

    Scale: one narrow projection, ONE map-side-combined groupBy on the
    (source, lang) key; the exact-dup signal is count(DISTINCT md5) —
    per-group distinct over a uniform hash, the same shuffle class as
    exact_dedup."""
    from .core import STOPWORDS, tokens

    toks = tokens(F.col("text"))
    n_tok = F.size(toks).cast("long")
    n_chars = F.length("text").cast("long")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    base = docs.select(
        "source", "lang",
        n_tok.alias("n_tok"),
        n_chars.alias("n_chars"),
        F.when(F.trim(F.col("text")) == "", F.lit(1))
        .otherwise(F.lit(0)).cast("long").alias("is_empty"),
        F.md5("text").alias("text_md5"),
        F.round(_quality_expr(toks, n_tok, n_chars, n_stop)
                * F.lit(1000000.0), 0).cast("long").alias("q_micro"),
    )
    return (
        base.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("is_empty").cast("long").alias("n_empty"),
            (F.count(F.lit(1)) - F.countDistinct("text_md5"))
            .cast("long").alias("n_dup_texts"),
            F.sum("n_tok").cast("long").alias("sum_tokens"),
            F.expr("sum(n_tok) DIV count(1)").cast("long")
            .alias("mean_tokens"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.expr("sum(q_micro) DIV count(1)").cast("long")
            .alias("mean_quality_micro"),
        )
    )


def _quality_expr(toks, n_tok, n_chars, n_stop):
    """The SAME quality blend as text.quality_scores (6dp-rounded),
    restated here over pre-built sub-expressions so corpus_report's
    projection stays one pass; the oracle mirrors text_profile's."""
    punct = F.length(
        F.regexp_replace(F.lower(F.col("text")), r"[a-z0-9\s]", ""))
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1)).cast("double")
    punct_ratio = punct / F.greatest(n_chars, F.lit(1)).cast("double")
    mean_word_len = n_chars / F.greatest(n_tok, F.lit(1)).cast("double")
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.3
        + F.when((stop_ratio >= 0.03) & (stop_ratio <= 0.6),
                 F.lit(1.0)).otherwise(F.lit(0.5)) * 0.2
        + F.least(mean_word_len / F.lit(8.0), F.lit(1.0)) * 0.2
    )
    return F.round(score, 6)


DEFAULT_QUANTILES = (0.01, 0.25, 0.5, 0.75, 0.9, 0.99)


def _quantiles(df: DataFrame, columns: list[str], ps, expr_for):
    # ONE aggregate per COLUMN, not per (column, p) cell: the exact
    # `percentile` buffers every value it sees per aggregate instance,
    # so the per-cell form pays len(ps) full-column buffers per column
    # on every partition and again at the merge — measured 13.1 s ->
    # ~2 s at sf0.1 on the 4-column lineitem sweep (6 quantiles:
    # 24 buffers -> 4).  expr_for receives the WHOLE ps tuple and
    # returns the array-typed aggregate.
    aggs = [expr_for(c, ps).alias(f"q__{c}") for c in columns]
    one = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', CAST({p} AS DOUBLE), "
        f"CAST(element_at(`q__{c}`, {i + 1}) AS DOUBLE)"
        for c in columns for i, p in enumerate(ps))
    n = len(columns) * len(ps)
    return one.selectExpr(
        f"stack({n}, {parts}) AS (column, p, value)")


def column_quantiles(df: DataFrame, columns: list[str],
                     ps=DEFAULT_QUANTILES) -> DataFrame:
    """Exact quantiles for numeric columns — the distribution half of
    the profiling pass (partition sizing, skew screening, outlier
    cutoffs all read quantiles, not min/max).  One aggregation over one
    scan computes every (column, p) cell; output is the long-form
    ``(column, p, value)``.

    Uses the exact ``percentile`` aggregate, whose linear interpolation
    is the standard (n-1)*p rule — measured bit-identical to DuckDB's
    ``quantile_cont`` on this data (the oracle hash-compares doubles).
    Exactness costs memory proportional to DISTINCT values per column;
    at scale use :func:`approx_column_quantiles` (fixed-memory KLL-style
    sketch, rank-error bounded)."""
    return _quantiles(
        df, columns, ps,
        lambda c, ps_: F.expr(
            f"percentile(`{c}`, array({', '.join(map(str, ps_))}))"))


def kmv_overlap(a: DataFrame, b: DataFrame, column: str,
                k: int = KMV_K) -> DataFrame:
    """Corpus-overlap estimate between two tables on one column — the
    metadata-level contamination/lineage pre-screen ("how much of eval
    is already in train?", "what fraction of crawl B is crawl A?")
    that runs BEFORE committing to the exact shingle-join
    decontamination pass.

    Pure KMV set algebra, so it stays ORACLE-exact like
    :func:`kmv_distinct`: the k-minima of the union are the k smallest
    of the two sketches' union (kmin merges exactly), and an element of
    the union k-minima belongs to A iff it is in A's sketch (A's kth
    minimum >= the union's kth), so ``match_k`` — union k-minima present
    in BOTH sketches — is an exact sample-based Jaccard numerator:

        jaccard  ~= match_k / n_union_sketch
        |A ∩ B|  ~= jaccard * est_union          (integer DIV forms)

    Under-k unions degenerate to EXACT set arithmetic (the sketches are
    the full hash sets).  One row out: ``(column, n_union_sketch,
    kth_hash, match_k, est_distinct_a, est_distinct_b, est_union,
    est_jaccard_permille, est_intersection)`` — every value an integer,
    hash-compared by the driver.

    Shape: two narrow sketch plans (as kmv_distinct), one k-row merge,
    1-row aggregates attached by bounded broadcasts."""
    def _sketch(df):
        h = md5_hash64(F.col(column).cast("string"))
        return (
            df.where(F.col(column).isNotNull())
            .select(h.alias("h"))
            .groupBy("h").agg(F.lit(1))
            .orderBy("h").limit(k).select("h")
        )

    def _est(sketch, name):
        return sketch.agg(
            F.count(F.lit(1)).cast("long").alias("ns"),
            F.max("h").cast("long").alias("kh"),
        ).select(
            F.when(F.col("ns") < k, F.col("ns"))
            .otherwise(F.expr(f"{(k - 1) * KMV_SPACE} DIV "
                              f"greatest(kh, 1)"))
            .cast("long").alias(name))

    ka, kb = _sketch(a), _sketch(b)
    merged = (
        ka.select("h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            kb.select("h", F.lit(0).alias("in_a"),
                      F.lit(1).alias("in_b")))
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        .orderBy("h").limit(k)
    )
    base = merged.agg(
        F.count(F.lit(1)).cast("long").alias("n_union_sketch"),
        F.max("h").cast("long").alias("kth_hash"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long")
        .alias("match_k"),
    )
    out = (
        base.join(F.broadcast(_est(ka, "est_distinct_a")))
        .join(F.broadcast(_est(kb, "est_distinct_b")))
        .withColumn(
            "est_union",
            F.when(F.col("n_union_sketch") < k, F.col("n_union_sketch"))
            .otherwise(F.expr(f"{(k - 1) * KMV_SPACE} DIV "
                              f"greatest(kth_hash, 1)"))
            .cast("long"))
    )
    return out.select(
        F.lit(column).alias("column"),
        "n_union_sketch", "kth_hash", "match_k",
        "est_distinct_a", "est_distinct_b", "est_union",
        F.when(F.col("n_union_sketch") > 0,
               F.expr("match_k * 1000 DIV n_union_sketch"))
        .otherwise(F.lit(0)).cast("long").alias("est_jaccard_permille"),
        F.when(F.col("n_union_sketch") > 0,
               F.expr("match_k * est_union DIV n_union_sketch"))
        .otherwise(F.lit(0)).cast("long").alias("est_intersection"),
    )


CORR_SCALE = 100        # 2-dp money/ratio columns quantize exactly


def numeric_correlations(df: DataFrame, columns: list[str],
                         scale: int = CORR_SCALE) -> DataFrame:
    """Pairwise Pearson correlation matrix over numeric columns — the
    feature-screening half of profiling (which columns carry the same
    signal, which join keys co-vary), in ONE aggregation over ONE scan.

    Engine-exact by the integer-moment trick: every value quantizes to
    an integer (``round(value * scale)`` — exact for 2-dp money/ratio
    columns at the default scale), all five moments per pair (n, Sx,
    Sy, Sxx, Syy, Sxy) accumulate as EXACT decimal(38,0) integer sums
    (order-independent, map-side combinable), and the only floating
    ops are the final casts/sqrt/divisions in a fixed order — so the
    DuckDB oracle (HUGEINT sums) hash-compares the rounded doubles.
    Scale invariance of Pearson r makes the quantization a NO-OP on the
    statistic beyond the quantization granularity itself (documented:
    the result is the correlation OF THE QUANTIZED values).

    Complete-case semantics: rows with a NULL in ANY requested column
    are dropped once up front (one shared n for every pair — the form
    whose moments all come from one pass).  Zero-variance columns yield
    NULL correlations (never a division blow-up).  Output:
    ``(col_x, col_y, n_rows, corr)`` for the ``m*(m-1)/2`` name-sorted
    pairs; m stays dashboard-sized so the single aggregation emits
    m*(m+3)/2 + 1 cells — trivially within one reducer."""
    cols = sorted(columns)
    base = df.select(*cols).na.drop("any")
    qdf = base.select(*[
        F.round(F.col(c).cast("double") * scale)
        .cast("decimal(38,0)").alias(f"q_{c}") for c in cols])
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(f"q_{c}")).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(f"q_{c}") * F.col(f"q_{c}"))
                    .alias(f"ss_{c}"))
    for i, cx in enumerate(cols):
        for cy in cols[i + 1:]:
            aggs.append(F.sum(F.col(f"q_{cx}") * F.col(f"q_{cy}"))
                        .alias(f"sp_{cx}__{cy}"))
    row = qdf.agg(*aggs)

    def _dec(col):
        return col.cast("decimal(38,0)")

    n = _dec(F.col("n"))
    pair_structs = []
    for i, cx in enumerate(cols):
        for cy in cols[i + 1:]:
            den_x = n * F.col(f"ss_{cx}") - F.col(f"s_{cx}") * F.col(f"s_{cx}")
            den_y = n * F.col(f"ss_{cy}") - F.col(f"s_{cy}") * F.col(f"s_{cy}")
            num = n * F.col(f"sp_{cx}__{cy}") \
                - F.col(f"s_{cx}") * F.col(f"s_{cy}")
            corr = F.when(
                (den_x > 0) & (den_y > 0),
                F.round(num.cast("double")
                        / F.sqrt(den_x.cast("double"))
                        / F.sqrt(den_y.cast("double")), 6))
            pair_structs.append(F.struct(
                F.lit(cx).alias("col_x"), F.lit(cy).alias("col_y"),
                F.col("n").alias("n_rows"), corr.alias("corr")))
    return (
        row.select(F.explode(F.array(*pair_structs)).alias("p"))
        .select("p.*")
    )


def approx_column_quantiles(df: DataFrame, columns: list[str],
                            ps=DEFAULT_QUANTILES,
                            accuracy: int = 10000) -> DataFrame:
    """Sketch twin of :func:`column_quantiles`: ``percentile_approx``
    (Greenwald-Khanna style, fixed memory, map-side-combinable single
    pass) — rank error <= 1/accuracy; the 100-TB path.  Error-bounded
    against the exact variant in tests, not oracle-hash-compared
    (the sketch is algorithm-specific by design)."""
    return _quantiles(
        df, columns, ps,
        lambda c, ps_: F.expr(
            f"percentile_approx(`{c}`, "
            f"array({', '.join(map(str, ps_))}), {accuracy})"))


def corpus_report_partials(docs: DataFrame) -> DataFrame:
    """The ADDITIVE half of :func:`corpus_report`: per-(source, lang)
    sums that merge across batches by plain addition — ``(source, lang,
    n_docs, n_empty, sum_tokens, sum_chars, sum_q_micro)``.  The one
    non-additive signal (``n_dup_texts``) needs distinct-hash state and
    is maintained by the streaming job (streaming/jobs.py
    stream_corpus_report); the derived means divide out at publish, so
    ``partials -> report`` reproduces the batch operator exactly."""
    from .core import STOPWORDS, tokens

    toks = tokens(F.col("text"))
    n_tok = F.size(toks).cast("long")
    n_chars = F.length("text").cast("long")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    base = docs.select(
        "source", "lang",
        n_tok.alias("n_tok"),
        n_chars.alias("n_chars"),
        F.when(F.trim(F.col("text")) == "", F.lit(1))
        .otherwise(F.lit(0)).cast("long").alias("is_empty"),
        F.round(_quality_expr(toks, n_tok, n_chars, n_stop)
                * F.lit(1000000.0), 0).cast("long").alias("q_micro"),
    )
    return (
        base.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("is_empty").cast("long").alias("n_empty"),
            F.sum("n_tok").cast("long").alias("sum_tokens"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum("q_micro").cast("long").alias("sum_q_micro"),
        )
    )
