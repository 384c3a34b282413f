"""Dataset-curation operators: the selection stages between a raw corpus
and a tokenizer — deterministic train/val splitting, per-group stratified
sampling, and context-window chunking.

Scale design:

- ``split_assign``   — pure per-row hash arithmetic (narrow, shuffle-free):
                       the split is a function of doc_id alone, so it is
                       stable under corpus growth, retries, and
                       repartitioning — the property that matters when the
                       corpus is rebuilt weekly and eval contamination is
                       a forensic question.
- ``stratified_cap`` — two-stage: a broadcast per-group count feeds a
                       hash-position PREFILTER that discards the bulk of
                       oversized groups BEFORE the per-group window runs,
                       so the row_number shuffle sees ~cap rows per group
                       instead of the whole group (a hot language with
                       10^9 docs would otherwise funnel through one
                       window partition).
- ``chunk_tokens``   — per-doc explode of O(n_tokens / step) chunk rows;
                       narrow (no shuffle), fan-out bounded by token
                       count, array slicing inside codegen.

All three are built-in Column expressions (no Python UDFs) with exact
DuckDB mirrors in pipeline/oracles.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .core import md5_hash64, tokens

SPLIT_BUCKETS = 1000
VAL_PERMILLE = 100          # 10% validation by default
SPLIT_SALT = "split-v1"     # version the assignment; bump to reshuffle

CAP_POSITIONS = 1_000_000   # hash-position resolution for stratified_cap
# prefilter margin: expected survivors per oversized group =
# (CAP_MARGIN_PCT/100)*cap + CAP_MARGIN_ABS.  The multiplicative part
# covers binomial spread at large caps, the additive part at small ones
# (1.2x of cap=10 is within one stddev of undershooting; +64 makes the
# undershoot probability negligible at every cap while the window input
# stays O(cap)).
CAP_MARGIN_PCT = 130
CAP_MARGIN_ABS = 64
DEFAULT_CAP = 100

CHUNK_SIZE = 64
CHUNK_OVERLAP = 8


def split_assign(docs: DataFrame,
                 val_permille: int = VAL_PERMILLE,
                 salt: str = SPLIT_SALT) -> DataFrame:
    """Deterministic hash split: bucket = md5(salt || doc_id) mod 1000,
    ``val`` iff bucket < ``val_permille``.

    Hash-based (not ``rand()``-based) so membership is a stable property
    of the document: adding or removing other docs never flips anyone's
    split, and re-running the pipeline reproduces it bit-for-bit.
    """
    bucket = (
        md5_hash64(F.concat(F.lit(salt), F.col("doc_id").cast("string")))
        % SPLIT_BUCKETS
    )
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < val_permille, F.lit("val"))
        .otherwise(F.lit("train")).alias("split"),
    )


def stratified_cap(docs: DataFrame, cap: int = DEFAULT_CAP,
                   group_col: str = "lang") -> DataFrame:
    """At most ``cap`` docs per ``group_col`` value, chosen as a
    deterministic pseudo-random sample (ordered by a doc hash, not by
    doc_id, so the kept set isn't biased toward early ids).

    Contract: the kept set is exactly the first ``cap`` survivors of the
    hash-position prefilter, ordered by (position, doc_id) — documented
    as a *sample*, not the global hash-top-k, because the prefilter
    (expected ~1.3*cap + 64 survivors per oversized group, see
    CAP_MARGIN_*) is what makes the per-group window scale; the DuckDB
    oracle mirrors the same two stages exactly, so parity holds even
    where the prefilter changes which rows the window sees.
    """
    pos = md5_hash64(F.col("doc_id").cast("string")) % CAP_POSITIONS
    tagged = docs.select("doc_id", F.col(group_col).alias("grp"),
                         pos.alias("pos"))
    counts = tagged.groupBy("grp").agg(F.count(F.lit(1)).alias("cnt"))
    # keep-all threshold for small groups; a margined slice of hash
    # positions for oversized ones.  DIV (not /) so the arithmetic is
    # exact integer division — Spark's / on longs is double division,
    # which could round across an integer boundary where DuckDB's //
    # floors, breaking the oracle mirror.
    numer = CAP_POSITIONS * (cap * CAP_MARGIN_PCT + CAP_MARGIN_ABS * 100)
    thresh = F.when(
        F.col("cnt") <= cap, F.lit(CAP_POSITIONS)
    ).otherwise(
        F.least(
            F.lit(CAP_POSITIONS).cast("long"),
            F.expr(f"CAST({numer} DIV (cnt * 100) AS LONG)"),
        )
    )
    survivors = (
        tagged.join(F.broadcast(counts.select("grp",
                                              thresh.alias("thresh"))),
                    "grp")
        .filter(F.col("pos") < F.col("thresh"))
    )
    w = Window.partitionBy("grp").orderBy("pos", "doc_id")
    return (
        survivors.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .select("doc_id", F.col("grp").alias(group_col),
                "pos", F.col("rn").cast("long").alias("sample_rank"))
    )


MIN_QUALITY = 0.75


def chunk_dedup(chunks: DataFrame) -> DataFrame:
    """Repeated-chunk detection over a ``chunk_tokens`` result: chunks
    whose content hash occurs more than once across the corpus —
    boilerplate headers, license blocks, mirrored passages — with the
    canonical (min doc_id) owner.  One hash-partitioned groupBy on the
    uniform chunk_hash key; the downstream drop is a left-anti join
    against this (small) set, same shape as dedup keep-one."""
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_occurrences") > 1)
    )


def curated_corpus(docs: DataFrame, labels: DataFrame,
                   quality: DataFrame,
                   min_quality: float = MIN_QUALITY) -> DataFrame:
    """The end-to-end curation pass a pretraining run starts from:
    quality gate AND dedup keep-one AND train-split membership, composed
    as three broadcast-or-hash left-semi joins over the corpus — the
    whole selection stays inside one Spark plan (no driver hops between
    stages).

    ``labels`` is a dedup_clusters result; ``quality`` a
    text.quality_scores result; both are plain DataFrames so callers can
    swap in any dedup strategy or scorer with the same shape.
    """
    from .dedup import keep_canonical

    kept = keep_canonical(docs, labels)
    good = (quality.filter(F.col("quality_score") >= min_quality)
            .select("doc_id"))
    train = (split_assign(docs).filter(F.col("split") == "train")
             .select("doc_id"))
    # Intersect the three id sets FIRST and persist the result, then run
    # ONE semi-join against the corpus.  Three separate semi-joins get
    # pushed through the corpus' UNION arms by Catalyst, which
    # DUPLICATES each un-materialized right side per arm — the final
    # physical plan scanned the corpus 14x and ran the quality
    # tokenization pass twice, with zero exchange reuse (plan capture
    # plans/r14/pipeline_curated_corpus_before.txt; opt guide §2.4
    # "remove shuffles outright" / §5 caching-when-reused).  The
    # persisted selection is doc_ids only (a few % of corpus bytes),
    # computed once inside the same timed plan; downstream broadcast
    # builds read the InMemoryRelation instead of re-deriving it.
    # The cache stays (the returned plan reads it — unpersisting here
    # would undo the dedup before the caller ever runs the plan); a
    # long-lived session clears it with spark.catalog.clearCache()
    # after materializing the result, same contract as the
    # training_chunks caches below (ADVICE r14).
    selected = (
        kept.join(good, "doc_id").join(train, "doc_id").persist()
    )
    return (
        docs.select("doc_id", "lang")
        .join(selected, "doc_id", "left_semi")
    )


def chunk_tokens(docs: DataFrame, chunk_size: int = CHUNK_SIZE,
                 overlap: int = CHUNK_OVERLAP,
                 tokenizer: str = "whitespace") -> DataFrame:
    """Context-window chunking: overlapping token windows of
    ``chunk_size`` every ``chunk_size - overlap`` tokens — the pass that
    turns documents into training sequences.  Chunk k covers tokens
    [k*step, k*step + chunk_size); chunks are generated while the start
    is inside the doc, so the tail may be short.  Each chunk carries a
    content hash for downstream chunk-level dedup.

    ``tokenizer="bpe"`` switches the unit to subword tokens
    (core.tokens_for), so ``chunk_size``/``overlap`` — and every
    downstream budget measured on ``n_chunk_tokens``, pack_sequences
    included — mean MODEL tokens; whitespace stays the oracle-parity
    default."""
    from .core import tokens_for

    step = chunk_size - overlap
    toks = tokens_for(F.col("text"), tokenizer)
    # ceil(n/step) in pure integer arithmetic — same DIV discipline as
    # stratified_cap (see the round-on-cast note there); mirrored in the
    # DuckDB oracle
    n_chunks = F.expr(f"(size(toks) + {step - 1}) DIV {step}").cast("int")
    chunk = F.slice(F.col("toks"), F.col("k") * step + 1, chunk_size)
    return (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") > 0)
        .select(
            "doc_id", "toks",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("k"),
        )
        .select(
            "doc_id",
            F.col("k").cast("long").alias("chunk_idx"),
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            md5_hash64(F.concat_ws(" ", chunk)).alias("chunk_hash"),
        )
    )


def training_chunks(docs: DataFrame, labels: DataFrame,
                    quality: DataFrame,
                    decont_report: DataFrame | None = None,
                    min_quality: float = MIN_QUALITY) -> DataFrame:
    """The COMPLETE pretraining-data pass, docs in -> training sequences
    out, as ONE closed Spark plan:

      quality gate ∩ dedup keep-one ∩ train split   (curated_corpus)
      minus eval-contaminated docs                  (decontaminate_report)
      -> overlapping context windows                (chunk_tokens)
      minus corpus-repeated boilerplate windows     (chunk_dedup, keeping
                                                     each repeated chunk's
                                                     canonical owner copy)

    Every stage is a hash/broadcast join or a per-doc projection — no
    driver round-trips between stages, so Catalyst sees (and can
    re-order/prune across) the whole pipeline, and the plan scales the
    same way its pieces were individually shown to.
    """
    kept = curated_corpus(docs, labels, quality, min_quality)
    if decont_report is not None:
        kept = kept.join(decont_report.select("doc_id"),
                         "doc_id", "left_anti")
    # NOT persisted, by measurement (r15 interleaved A/B at sf1,
    # median-of-5 in one JVM: no-persist 12.35 s vs persist 12.72 s;
    # the driver's 32-core r14 runs had flagged the persist as a ~23%
    # regression) — the id set sits directly on curated_corpus' already-
    # persisted `selected` cache, so re-deriving it per UNION arm is one
    # cheap anti-join against cached ids, while the extra persist added
    # a materialization pass (the same mechanism measured as a loss on
    # semantic_dedup in r14; opt guide §5 cache-only-when-recompute-
    # costs-more).
    kept = kept.select("doc_id")
    # `chunks` feeds THREE consumers below (the kept-chunk join, the
    # boilerplate aggregate, and the canonical-position resolution);
    # without a persist, each consumer re-executes the whole curation
    # subtree above it — measured 2x wall time at sf0.1.  The cache
    # stays (the returned plan reads it); a long-lived session can
    # spark.catalog.clearCache() after materializing the result.
    chunks = chunk_tokens(
        docs.join(kept.select("doc_id"), "doc_id", "left_semi")).persist()
    boiler = chunk_dedup(chunks)
    # drop repeated windows EXCEPT the canonical owner's FIRST copy, so
    # shared content survives exactly once corpus-wide — including when
    # the canonical doc itself repeats the window (in-doc boilerplate).
    # The canonical position is resolved with one extra aggregation over
    # only the flagged hashes' canonical-doc rows (a bounded set).
    canon = boiler.select("chunk_hash",
                          F.col("canonical_doc_id").alias("_canon"))
    canon_first = (
        chunks.join(canon, "chunk_hash")
        .filter(F.col("doc_id") == F.col("_canon"))
        .groupBy("chunk_hash")
        .agg(F.min("chunk_idx").alias("_canon_idx"))
    )
    return chunks.join(
        canon.join(canon_first, "chunk_hash"), "chunk_hash", "left",
    ).filter(
        F.col("_canon").isNull()
        | ((F.col("doc_id") == F.col("_canon"))
           & (F.col("chunk_idx") == F.col("_canon_idx")))
    ).drop("_canon", "_canon_idx")


def pack_sequences(chunks: DataFrame,
                   token_budget: int = 2048) -> DataFrame:
    """Pack each doc's chunks (in chunk_idx order) into consecutive
    training sequences of ~``token_budget`` tokens — the batch-assembly
    step that turns chunked documents into fixed-budget model inputs,
    minimizing padding waste.

    Semantics (deterministic, engine-independent): a chunk joins
    sequence ``floor(tokens_before_it_in_doc / token_budget)``, where
    "before" is the exclusive running sum in chunk_idx order.  Every
    sequence therefore holds >= token_budget tokens except the doc's
    last (padding only ever at the tail of a doc), and overshoots by
    at most one chunk — the bounded trade that keeps assignment a pure
    prefix-sum instead of a sequential first-fit loop.  Sequences never
    span docs, so ids are (doc_id, seq_idx) with no global counter.

    Scale notes: ONE shuffle (the per-doc window); the follow-up
    groupBy(doc_id, seq_idx) reuses the window's hash partitioning on
    doc_id (asserted in tests — exchanges == 1 end to end).  The
    running sum uses integer ``DIV`` so the bucketing stays exact at
    any magnitude.  Parallelism is per-doc, the natural key: no global
    ordering, no driver sequencing.
    """
    w = (Window.partitionBy("doc_id").orderBy("chunk_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    tagged = chunks.withColumn(
        "_cum_excl",
        F.coalesce(F.sum("n_chunk_tokens").over(w), F.lit(0)),
    ).withColumn("seq_idx", F.expr(f"_cum_excl DIV {int(token_budget)}"))
    return (
        tagged.groupBy("doc_id", "seq_idx")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_chunk_tokens").cast("long").alias("seq_tokens"),
            F.min("chunk_idx").alias("first_chunk_idx"),
            F.max("chunk_idx").alias("last_chunk_idx"),
        )
    )


def pack_sequences_ffd(chunks: DataFrame,
                       token_budget: int = 2048) -> DataFrame:
    """First-fit-decreasing twin of :func:`pack_sequences`: per doc,
    pack chunks into the FEWEST <= ``token_budget`` sequences (FFD is
    within 11/9·OPT+1 of optimal bin packing), trading the greedy
    packer's chunk-order contiguity for minimal padding.  A single
    chunk larger than the budget gets its own (overflowing) sequence —
    same never-split-a-chunk contract as greedy.  Returns one row per
    packed sequence: ``(doc_id, seq_idx, n_chunks, seq_tokens)``;
    ``seq_idx`` orders bins by (seq_tokens DESC, first-placed chunk_idx
    ASC) so output is deterministic.

    Implementation note (the brief's escalation ladder): bin packing is
    inherently a sequential first-fit loop — not expressible as window/
    groupBy compositions — so this is the repo's Arrow-batched
    ``applyInPandas`` case: the loop runs per doc (bounded work, ~1e2
    chunks), parallelism is per-doc across executors, and the shuffle
    is the same single groupBy(doc_id) exchange the greedy packer pays.
    Rule of thumb: greedy for streaming-order locality (contiguous
    windows stay adjacent, but sequences overshoot the budget by up to
    one chunk), FFD when the budget is a HARD cap and padding waste
    dominates cost — FFD never exceeds it (oversize singletons aside).
    """
    budget = int(token_budget)
    if budget <= 0:
        raise ValueError(f"token_budget must be positive, got {budget}")
    out_schema = ("doc_id long, seq_idx long, n_chunks long, "
                  "seq_tokens long")

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["n_chunk_tokens", "chunk_idx"], ascending=[False, True])
        bins: list[list[int]] = []  # [tokens, n_chunks, first_idx]
        for idx, t in zip(pdf["chunk_idx"], pdf["n_chunk_tokens"]):
            t = int(t)
            for b in bins:
                if b[0] + t <= budget:
                    b[0] += t
                    b[1] += 1
                    break
            else:
                bins.append([t, 1, int(idx)])
        bins.sort(key=lambda b: (-b[0], b[2]))
        doc = int(pdf["doc_id"].iloc[0])
        return pd.DataFrame(
            [(doc, i, b[1], b[0]) for i, b in enumerate(bins)],
            columns=["doc_id", "seq_idx", "n_chunks", "seq_tokens"])

    return (
        chunks.select("doc_id", "chunk_idx", "n_chunk_tokens")
        .groupBy("doc_id")
        .applyInPandas(_pack, out_schema)
    )
