"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
and embedding-cosine near-dup.

Scale design (the point of each variant):

- ``exact``            — one hash-partitioned groupBy on md5(text); the
                         only full shuffle, keyed on a uniform hash so it
                         cannot skew.
- ``ngram_jaccard``    — inverted-index self-join on shingle hash (never a
                         cross join): candidate pairs are generated only
                         for docs sharing a shingle, then scored exactly.
- ``minhash_lsh``      — constant-size signature (16 minhashes) per doc,
                         banded into 4 bucket keys; the self-join runs on
                         (band, sig) buckets, so work is proportional to
                         collisions, not to |docs|².
- ``simhash``          — 32-bit signature over shingle hashes, 8-bit chunk
                         banding (finds every pair with Hamming <= 3 and
                         most up to the verify threshold), exact Hamming
                         via bit_count(xor).
- ``embedding_cosine`` — blocked by the upstream cluster ``label`` (the
                         IVF coarse-quantizer pattern); exact cosine only
                         within blocks.

Implementation note (learned from .explain + profiling): signatures are
built RELATIONALLY — explode to a (doc_id, shingle_hash) table behind a
Generate barrier, then groupBy — NOT with nested higher-order array
lambdas over the raw text column.  Catalyst inlines nested lambdas, so the
array formulation re-evaluated the token split per shingle element
(O(tokens²) per doc, interpreted); the relational form tokenizes each doc
exactly once and keeps every stage linear.  The DuckDB oracle keeps the
list-comprehension formulation — two independent shapes, same values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .core import (
    NGRAM_MAX_DF,
    NGRAM_MAX_SET,
    NUM_MINHASHES,
    P,
    SIMHASH_BITS,
    cosine,
    dot,
    md5_hash64,
    tokens,
)


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Hash-groupBy exact dedup: every doc mapped to the canonical
    (min doc_id) member of its md5(text) group."""
    hashed = docs.select("doc_id", F.md5("text").alias("text_md5"))
    groups = hashed.groupBy("text_md5").agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count(F.lit(1)).alias("dup_group_size"),
    )
    return (
        hashed.join(groups, "text_md5")
        .select(
            "doc_id", "text_md5", "canonical_doc_id", "dup_group_size",
            (F.col("doc_id") != F.col("canonical_doc_id"))
            .alias("is_duplicate"),
        )
    )


def shingle_table(docs: DataFrame, n: int = 3,
                  distinct: bool = True) -> DataFrame:
    """(doc_id, shingle_hash) for word ``n``-gram shingles; docs
    shorter than ``n`` tokens contribute one whole-doc shingle.
    ``distinct=True`` (default) dedupes per (doc, shingle).

    The tokens array is materialized once per doc by the projection under
    the Generate (explode) barrier; each exploded row then slices three
    tokens and hashes ~25 chars — everything linear in corpus size.

    ``distinct=False`` skips the dedup EXCHANGE (a full shuffle of the
    exploded table — measured 2x the narrow pass at sf0.1): consumers
    whose aggregates are duplicate-insensitive (``min`` minhashes,
    ``collect_set`` shingle sets) compute identical results from the raw
    exploded rows, and their own map-side partial aggregation absorbs the
    duplicates without shuffling them (opt guide §2.3-2.4).  Consumers
    that COUNT rows per key (ngram df counts, simhash bit votes) must
    keep the default.
    """
    exploded = (
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .select(
            "doc_id", "toks",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size("toks") - (n - 1), F.lit(1)),
                )
            ).alias("i"),
        )
        .select(
            "doc_id",
            md5_hash64(
                F.concat_ws(" ", F.slice(F.col("toks"), F.col("i"), n))
            ).alias("shingle_hash"),
        )
    )
    return exploded.distinct() if distinct else exploded


def ngram_candidates(sh: DataFrame, max_df: int) -> DataFrame:
    """Candidate (doc_a, doc_b) pairs from the inverted index, with
    shingles hotter than ``max_df`` pruned from the posting lists BEFORE
    the self-join — candidate count is bounded by sum(df**2) over
    surviving shingles, never by a single hot key."""
    rare = (
        sh.groupBy("shingle_hash")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("shingle_hash")
    )
    index = sh.join(rare, "shingle_hash")
    a, b = index.alias("a"), index.alias("b")
    return (
        a.join(b, (F.col("a.shingle_hash") == F.col("b.shingle_hash"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3,
                        threshold: float = 0.5,
                        max_df: int = NGRAM_MAX_DF,
                        max_set_size: int = NGRAM_MAX_SET,
                        sketch_estimator: str = "pairwise") -> DataFrame:
    """Exact n-gram Jaccard over an inverted-index self-join.

    Candidate generation prunes shingles whose document frequency exceeds
    ``max_df`` (standard LSH hygiene): one ubiquitous shingle otherwise
    produces df**2 candidate pairs — the posting-list self-join's skew
    bomb at 100 TB.  Scoring uses the per-doc shingle sets capped to the
    ``max_set_size`` SMALLEST hash values (sort_array + slice): for docs
    under the cap (every doc at test scale) the score is the exact
    Jaccard; a book-length doc above it is scored on its bottom-k hash
    sketch.  Two estimators via ``sketch_estimator``: ``"pairwise"``
    (default, and what the driver oracle mirrors) scores
    |A_k ∩ B_k| / |A_k ∪ B_k| over the two per-doc sketches — a biased
    but bounded approximation; ``"union"`` is the classic UNBIASED
    bottom-k estimator, |both ∩ bottom_k(A∪B)| / |bottom_k(A∪B)|, which
    is computable exactly from the same per-doc sketches (the k smallest
    of the union are a subset of the two sketches' elements) at the cost
    of one extra array merge per candidate pair.  Both are exact full
    Jaccard whenever the docs fit under the cap.  Both caps affect recall only for (a) pairs connected purely
    through stopword-class shingles hotter than ``max_df`` (not near-dups
    at a 0.5 threshold anyway) and (b) sketch noise on docs with more
    than ``max_set_size`` distinct shingles.  The DuckDB oracle mirrors
    BOTH caps, so the two shapes implement the same contract at any
    corpus scale, not just where the caps never fire.
    """
    # the shingle index feeds multiple plan branches (df counts, candidate
    # join sides, full-set scoring); persist so Spark materializes it once
    # instead of re-tokenizing the corpus per branch
    sh = shingle_table(docs, n).persist()
    cand = ngram_candidates(sh, max_df)
    hs = sh.groupBy("doc_id").agg(
        F.slice(F.sort_array(F.collect_set("shingle_hash")),
                1, max_set_size).alias("hs"))
    inter = F.size(F.array_intersect(F.col("ha.hs"), F.col("hb.hs")))
    union = (F.size(F.col("ha.hs")) + F.size(F.col("hb.hs")) - inter)
    if sketch_estimator == "union":
        # unbiased bottom-k: restrict to the k smallest hashes of the
        # UNION (computable exactly from the two per-doc bottom-k
        # sketches), then estimate J = |both ∩ bottom_k(A∪B)| / k'.
        # Exact when both docs are under the cap (the union slice then
        # holds the whole union).
        uk = F.slice(
            F.array_sort(F.array_union(F.col("ha.hs"), F.col("hb.hs"))),
            1, max_set_size)
        in_both = F.size(F.array_intersect(
            uk, F.array_intersect(F.col("ha.hs"), F.col("hb.hs"))))
        score = F.round(in_both / F.size(uk).cast("double"), 6)
        n_common = in_both
    else:
        score = F.round(inter / union.cast("double"), 6)
        n_common = inter
    return (
        cand.join(hs.alias("ha"), F.col("doc_a") == F.col("ha.doc_id"))
        .join(hs.alias("hb"), F.col("doc_b") == F.col("hb.doc_id"))
        .select(
            "doc_a", "doc_b",
            n_common.cast("long").alias("n_common"),
            score.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _signatures_from(sh: DataFrame) -> DataFrame:
    """(doc_id, minhashes array<long>[16]) in ONE groupBy pass: all 16
    hash functions are independent min() aggregates over the same rows
    (a j-explode would shuffle 16x the shingle table for no reason)."""
    aggs = [
        F.min(((2 * j + 3) * F.col("shingle_hash") + 5 * j + 7) % P)
        .alias(f"mh{j}")
        for j in range(NUM_MINHASHES)
    ]
    return (
        sh.groupBy("doc_id")
        .agg(*aggs)
        .select(
            "doc_id",
            F.array(*[F.col(f"mh{j}") for j in range(NUM_MINHASHES)])
            .alias("minhashes"),
        )
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, minhashes array<long>[16]) — j-ordered signature.

    ``min`` is duplicate-insensitive, so the shingle dedup exchange is
    skipped (identical signatures, one less full shuffle)."""
    return _signatures_from(shingle_table(docs, distinct=False))


_BAND_SIGS_EXPR = (
    "transform(sequence(0, 3), b -> struct("
    "cast(b AS int) AS band, "
    f"aggregate(slice(minhashes, b * 4 + 1, 4), 0L, "
    f"(acc, m) -> (acc * 31 + m) % {P}) AS sig))"
)


def minhash_lsh_pairs(docs: DataFrame,
                      threshold: float = 0.5) -> DataFrame:
    """MinHash+LSH near-dup: band buckets -> candidate pairs -> verify
    with BOTH the signature estimate and the exact Jaccard.

    Stages (all shuffles keyed on doc_id or a uniform band signature):
    shingle index -> 16 minhashes -> 4 folded band keys -> bucket
    self-join -> signature/shingle-set joins for verification.
    """
    # ONE pass from raw exploded shingles to the per-doc profile
    # (16 minhashes + the distinct shingle set), fused into a single
    # groupBy(doc_id): min and collect_set are both duplicate-
    # insensitive, so the shingle dedup exchange is skipped entirely
    # (distinct=False; guide §2.4 "remove shuffles outright") and the
    # signature/shingle-set aggregations — previously two separate
    # passes over a persisted shingle table — share one exchange
    # (guide §2.3 "aggregate before you shuffle").  Persisting the
    # (small, per-doc) profile instead of the (corpus-sized) shingle
    # table also shrinks the cache footprint; the verify stage joins
    # ONE table per pair side instead of two.
    mh_aggs = [
        F.min(((2 * j + 3) * F.col("shingle_hash") + 5 * j + 7) % P)
        .alias(f"mh{j}")
        for j in range(NUM_MINHASHES)
    ]
    profs = (
        shingle_table(docs, distinct=False)
        .groupBy("doc_id")
        .agg(*mh_aggs, F.collect_set("shingle_hash").alias("hs"))
        .select(
            "doc_id",
            F.array(*[F.col(f"mh{j}") for j in range(NUM_MINHASHES)])
            .alias("minhashes"),
            "hs",
        )
        .persist()
    )
    banded = (
        profs.select("doc_id",
                     F.explode(F.expr(_BAND_SIGS_EXPR)).alias("bs"))
        .select("doc_id", F.col("bs.band").alias("band"),
                F.col("bs.sig").alias("sig"))
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.sig") == F.col("b.sig"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    est = (
        F.size(F.filter(F.zip_with(F.col("pa.minhashes"),
                                   F.col("pb.minhashes"),
                                   lambda x, y: x == y),
                        lambda v: v))
        / F.lit(float(NUM_MINHASHES))
    )
    inter = F.size(F.array_intersect(F.col("pa.hs"), F.col("pb.hs")))
    union = (F.size(F.col("pa.hs")) + F.size(F.col("pb.hs")) - inter)
    return (
        cand.join(profs.alias("pa"), F.col("doc_a") == F.col("pa.doc_id"))
        .join(profs.alias("pb"), F.col("doc_b") == F.col("pb.doc_id"))
        .select(
            "doc_a", "doc_b",
            F.round(est, 6).alias("est_jaccard"),
            F.round(inter / union.cast("double"), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_table(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash over the shingle-hash set: signed bit votes,
    reassembled into a ``bits``-wide signature.

    Shingles (not raw tokens) are the hashed feature: on a corpus drawn
    from one small vocabulary, token-frequency SimHash collapses to
    near-identical signatures for every doc, while shingle sets stay
    discriminative.
    """
    # all ``bits`` bit-votes as independent conditional sums in ONE
    # groupBy(doc_id) pass (the same shape as _signatures_from) — an
    # explode/cross-join over bit ids would shuffle ``bits``x the shingle
    # table for no reason
    sh = shingle_table(docs)
    aggs = [
        F.sum(
            F.expr(f"shiftright(shingle_hash, {j})").bitwiseAND(1) * 2 - 1
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    sig = F.lit(0).cast("long")
    for j in range(bits):
        sig = sig + F.when(
            F.col(f"v{j}") >= 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return sh.groupBy("doc_id").agg(*aggs).select(
        "doc_id", sig.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup: 8-bit chunk banding for candidates, exact
    Hamming distance (bit_count of xor) to verify."""
    sims = simhash_table(docs).persist()  # both sides of the chunk join
    chunked = sims.select(
        "doc_id", "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), c -> struct("
                "cast(c AS int) AS chunk, "
                "shiftright(simhash, c * 8) & 255 AS val))"
            )
        ).alias("cv"),
    ).select("doc_id", "simhash", F.col("cv.chunk").alias("chunk"),
             F.col("cv.val").alias("val"))
    a, b = chunked.alias("a"), chunked.alias("b")
    cand = (
        a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
               & (F.col("a.val") == F.col("b.val"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("a.simhash").alias("sim_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("b.simhash").alias("sim_b"))
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.select("doc_a", "doc_b",
                    hamming.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


EMB_BANDS = 2          # sign-bucket bands composed with the label block
EMB_BAND_PLANES = 4    # hyperplanes (bucket bits) per band


def embedding_near_dup(emb: DataFrame,
                       threshold: float = 0.98,
                       bands: int = EMB_BANDS,
                       band_planes: int = EMB_BAND_PLANES) -> DataFrame:
    """Embedding-cosine near-dup blocked by (``label``, sign-bucket):
    the cluster label is the IVF-style coarse quantizer, and each label
    block is further split by banded random-hyperplane sign buckets
    (similarity.hyperplane) so ONE hot label cannot go quadratic — a
    block of B vectors joins ~B^2/2^band_planes pairs per band instead
    of B^2.

    Banding is the recall knob (same trick as minhash_lsh_pairs): a pair
    is a candidate if it agrees on the full bucket of ANY band.  At the
    default threshold 0.98 (angle ~11.5 deg), P[one hyperplane splits a
    pair] = angle/pi ~ 0.064, so a 4-plane band keeps ~77% of true pairs
    and two independent bands together keep ~95% — a documented recall
    trade for the 2^4-per-band blow-up bound, exactly mirrored by the
    DuckDB oracle (pipeline/oracles.py) so the differential stays exact.
    """
    from .similarity import hyperplane

    def band_bucket(b: int) -> F.Column:
        bucket = F.lit(0).cast("long")
        for i in range(band_planes):
            j = b * band_planes + i
            bit = F.when(
                dot(F.col("embedding"), hyperplane(j)) >= 0,
                F.lit(1 << i).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            bucket = bucket + bit
        return bucket

    tagged = emb.select(
        "vec_id", "label", "embedding",
        F.explode(F.array(*[
            F.struct(F.lit(b).cast("int").alias("band"),
                     band_bucket(b).alias("bval"))
            for b in range(bands)
        ])).alias("bb"),
    ).select("vec_id", "label", "embedding",
             F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval"))

    a = tagged.select(F.col("vec_id").alias("vec_a"), "label",
                      "band", "bval", F.col("embedding").alias("ea"))
    b = tagged.select(F.col("vec_id").alias("vec_b"),
                      F.col("label").alias("label_b"),
                      F.col("band").alias("band_b"),
                      F.col("bval").alias("bval_b"),
                      F.col("embedding").alias("eb"))
    cos = F.round(cosine(F.col("ea"), F.col("eb")), 6)
    return (
        a.join(b, (F.col("label") == F.col("label_b"))
               & (F.col("band") == F.col("band_b"))
               & (F.col("bval") == F.col("bval_b"))
               & (F.col("vec_a") < F.col("vec_b")))
        .select("vec_a", "vec_b", F.col("label").cast("long").alias("label"),
                cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        # a pair can match in several bands — dedupe AFTER the threshold
        # filter so the distinct shuffles only surviving near-dup rows
        .distinct()
    )


def dedup_clusters(pairs: DataFrame,
                   max_iters: int | None = None,
                   checkpoint_dir: str | None = None) -> DataFrame:
    """Connected components over near-dup pairs -> (doc_id, canonical_id):
    the step that turns pairwise matches into dedup groups (keep one doc
    per component, drop the rest).

    Iterative min-label propagation with POINTER JUMPING: every doc
    starts labeled with itself; each round, a doc adopts the smallest
    label among itself and its neighbors, then labels are path-halved
    (label := label(label)) — the doubling step from the
    large-star/small-star family of MapReduce connected-components
    algorithms.  Neighbor-min alone needs diameter rounds (a chain of N
    pairwise near-dups takes N rounds); the jump doubles propagation
    reach each round, so convergence is O(log diameter) — 6-7 rounds for
    a 100-node chain, 2-3 for the star-like components real near-dup
    corpora produce.  Stop when a round changes nothing.

    The loop runs UNTIL CONVERGENCE by default — periodic checkpointing
    bounds the lineage, and the diameter bounds the rounds, so no
    iteration cap is needed for termination.  Pass ``max_iters`` to bound
    wall-clock instead; exhausting it raises rather than silently
    returning half-merged labels (which would corrupt keep_canonical
    downstream — a doc would survive dedup under a non-canonical id).

    Scale notes: each round is TWO shuffles — (1) one union-then-groupBy
    on doc_id that fuses the neighbor-min aggregation, the least(self,
    neighbor) merge, and the old-label capture into a single exchange (a
    marker column distinguishes each doc's self row from its neighbor
    contributions, so ``min(label)`` is the merged label and
    ``max(label WHERE is_self)`` is the previous round's label riding
    along for the convergence check — no re-join against the previous
    label table), and (2) the jump's label-keyed self-join, through
    which ``old_label`` also rides.  ROUND 0 is cheaper still: with
    identity labels the neighbor-min join degenerates to label(b) = b,
    so the first round is ONE groupBy over the edge table
    (least(doc_id, min(neighbor))) — no initial label table, no join.
    The label table is checkpointed
    EVERY round: each round's plan references the previous round's
    several times (neighbor join, jump self-join), so without truncation
    the logical plan grows ~4x per round and Catalyst's analysis
    dominates wall time long before the data does (measured: a 103-edge
    graph spent ~50 s in planning with every-3rd-round truncation, ~3 s
    with every-round).  The round's label table is materialized by the
    convergence check anyway, so the eager checkpoint adds no extra pass
    over the data.  ``checkpoint_dir=None`` uses ``localCheckpoint``
    (fast, but the truncated RDD lives in executor storage — lost on
    executor failure); pass a DFS path to switch to reliable
    ``checkpoint()``, the fault-tolerant variant to use on a real
    cluster with executor churn.  The convergence test is a count
    aggregate, not a collect of labels — and with ``localCheckpoint``
    the checkpoint is LAZY so that one count job per round both
    materializes the label table and measures the change delta (the
    reliable variant keeps the eager write + a limit(1) probe).

    SESSION-GLOBAL SIDE EFFECT: passing ``checkpoint_dir`` calls
    ``setCheckpointDir`` on the shared SparkContext (like the
    ``nanosAsLong`` conf in sources/tpch_adapter.py, there is no scoped
    form), so later ``checkpoint()`` calls anywhere in the session write
    under ``checkpoint_dir`` too.  Reliable-checkpoint files ARE
    self-cleaning across rounds: each round checkpoints into its own
    ``round-N/`` subdirectory and deletes ``round-(N-1)/`` once round N
    is materialized (lineage is truncated, so the prior files are
    unreferenced), leaving at most ONE round's files on disk — a
    scheduled job cannot accumulate unbounded DFS storage.  COROLLARY:
    no OTHER ``checkpoint()`` may run concurrently in the session while
    this loop is live — because the checkpoint dir is session-global, a
    concurrent checkpoint lands inside the current ``round-N/`` and is
    DELETED on the next rotation (not merely orphaned).  Run concurrent
    checkpointing work with ``checkpoint_dir=None`` (localCheckpoint
    does not touch the shared dir) or in its own SparkSession.  The final
    round's directory backs the RETURNED DataFrame and therefore
    survives; callers delete ``checkpoint_dir`` when done with the
    result (or persist it elsewhere first).
    """
    sc = pairs.sparkSession.sparkContext
    c0, c1 = pairs.columns[0], pairs.columns[1]
    # symmetrize with ONE scan of pairs (explode both directions) — a
    # union of pairs with its swap would evaluate the (possibly
    # expensive, e.g. minhash) upstream plan twice
    sym = (
        pairs.select(F.explode(F.array(
            F.struct(F.col(c0).alias("a"), F.col(c1).alias("b")),
            F.struct(F.col(c1).alias("a"), F.col(c0).alias("b")),
        )).alias("e"))
        .select("e.a", "e.b")
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    labels: DataFrame | None = None  # identity init is IMPLICIT (round 0)
    it = 0
    prev_round_dir: str | None = None
    while True:
        if checkpoint_dir is not None:
            round_dir = f"{checkpoint_dir}/round-{it}"
            sc.setCheckpointDir(round_dir)
        else:
            round_dir = None
        if labels is None:
            # ROUND-0 SHORTCUT (opt guide §2.4): with identity labels,
            # the neighbor-min join degenerates to label(b) = b, so the
            # whole contrib-join + union collapses to ONE groupBy over
            # the (already persisted) edge table — min(self, neighbors)
            # = least(a, min(b)) — skipping the initial distinct-labels
            # exchange AND the round-0 join's two shuffles outright.
            merged = (
                sym.groupBy("a")
                .agg(F.min("b").alias("_nbmin"))
                .select(
                    F.col("a").alias("doc_id"),
                    F.least(F.col("a"), F.col("_nbmin")).alias("label"),
                    F.col("a").alias("old_label"),
                )
            ).persist()
        else:
            # one exchange: neighbor contributions + self rows -> per-doc
            # min(label), with the pre-round label captured from the
            # self row
            contrib = (
                sym.join(labels, sym["b"] == labels["doc_id"])
                .select(F.col("a").alias("doc_id"), "label",
                        F.lit(False).alias("is_self"))
            )
            merged = (
                labels.select("doc_id", "label",
                              F.lit(True).alias("is_self"))
                .unionByName(contrib)
                .groupBy("doc_id")
                .agg(
                    F.min("label").alias("label"),
                    F.max(F.when(F.col("is_self"), F.col("label")))
                    .alias("old_label"),
                )
            ).persist()  # feeds both sides of the jump join
        # pointer jump (path halving): label := min(label, label(label)).
        # Labels are always doc_ids present in the table, so the self-join
        # hits; left+coalesce keeps it total anyway.  One extra shuffle
        # per round buys O(log diameter) total rounds.
        parents = merged.select(
            F.col("doc_id").alias("label"),
            F.col("label").alias("grand"),
        )
        jumped = (
            merged.join(parents, "label", "left")
            .select(
                "doc_id",
                F.least(F.col("label"),
                        F.coalesce(F.col("grand"), F.col("label")))
                .alias("label"),
                "old_label",
            )
            .select(
                "doc_id", "label",
                (F.col("label") != F.col("old_label")).alias("chg"),
            )
        )
        if checkpoint_dir is not None:
            # reliable checkpoint stays EAGER: a lazy reliable
            # checkpoint recomputes the RDD to write the files (Spark
            # docs recommend persist-before-checkpoint for that reason),
            # which would cost MORE than the extra count job it saves
            stepped = jumped.checkpoint(eager=True)
            changed = stepped.filter("chg").limit(1).count()
        else:
            # LAZY localCheckpoint + full-count convergence check: the
            # count job computes every partition of the jump output,
            # and localCheckpoint persists partitions as they are
            # computed — so ONE job per round both materializes the
            # truncated-lineage label table and returns the change
            # delta (the eager checkpoint ran a separate
            # materialization job before the limit(1).count, i.e. two
            # jobs per round; at the small-SF job floor the per-round
            # job launches are most of the wall time — opt guide §1.2)
            stepped = jumped.localCheckpoint(eager=False)
            changed = stepped.filter("chg").count()
        merged.unpersist()
        # round it is materialized; round it-1's files are unreferenced
        if prev_round_dir is not None:
            _delete_path(sc, prev_round_dir)
        prev_round_dir = round_dir
        if labels is not None:
            labels.unpersist()
        labels = stepped.select("doc_id", "label")
        if changed == 0:
            break
        it += 1
        if max_iters is not None and it >= max_iters:
            sym.unpersist()
            raise RuntimeError(
                f"dedup_clusters: still converging after {max_iters} "
                "rounds (component diameter exceeds the cap); labels "
                "would be wrong — raise max_iters or leave it None"
            )
    sym.unpersist()
    return labels.select("doc_id", F.col("label").alias("canonical_id"))


def _delete_path(sc, path: str) -> None:
    """Recursively delete ``path`` through the Hadoop FileSystem API, so
    checkpoint-round cleanup works on any store Spark can checkpoint to
    (local, HDFS, object stores), not just the driver's local disk."""
    jvm = sc._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


def decontaminate_report(train: DataFrame, eval_docs: DataFrame,
                         n: int = 3, min_common: int = 3) -> DataFrame:
    """Train/eval decontamination: training docs that share at least
    ``min_common`` distinct word n-gram shingles with the EVAL CORPUS
    (union of all eval docs' shingles) — the standard hygiene pass that
    keeps benchmark answers out of a training set.  Returns
    ``(doc_id, n_common, n_doc, overlap_ratio)`` for contaminated train
    docs — the count of shared shingles, the doc's own distinct-shingle
    count, and their round-6 ratio, so callers can threshold on GRADED
    contamination (a 3-shingle hit means something different in a
    20-shingle doc than in a 2000-shingle one); compose with
    ``drop_contaminated`` to get the clean corpus.

    Scale notes: both sides reduce to (id, shingle_hash) inverted-index
    tables; the overlap is ONE hash join on the uniform shingle_hash key
    followed by a per-doc count — no pairwise doc comparison anywhere, so
    eval sets of millions of rows are fine.  The eval side is deduped to
    distinct hashes first, which keeps the join's build side minimal (AQE
    broadcasts it when it fits).  Both counts come from ONE pass over
    the train shingle table: the eval probe is a LEFT join (the probe
    side is distinct, so no fan-out) and n_common is the count of
    matched rows — the shingle subtree is never scanned twice.
    """
    sh_t = shingle_table(train, n)
    sh_e = (
        shingle_table(eval_docs, n)
        .select("shingle_hash").distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        sh_t.join(sh_e, "shingle_hash", "left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_doc"),
             F.count("_hit").cast("long").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
        .select(
            "doc_id", "n_common", "n_doc",
            F.round(F.col("n_common") / F.col("n_doc"), 6)
            .alias("overlap_ratio"))
    )


def drop_contaminated(train: DataFrame, report: DataFrame) -> DataFrame:
    """The clean corpus: train docs minus the decontamination report's
    hits (left-anti hash join, same shape as keep_canonical)."""
    return train.join(report.select("doc_id"), "doc_id", "left_anti")


def keep_canonical(docs: DataFrame, labels: DataFrame) -> DataFrame:
    """Keep-one materialization: the corpus after dedup — every doc that is
    either untouched by any near-dup pair or the canonical (min-id) member
    of its cluster.  Returns the surviving ``doc_id`` set.

    Scale notes: a left-anti hash join against the drop set (non-canonical
    cluster members).  The drop set is bounded by the number of duplicate
    docs, typically a small fraction of the corpus — AQE will broadcast it
    when it fits, and a shuffled anti-join on the uniform doc_id key is
    still linear when it doesn't.
    """
    drop = labels.filter(
        F.col("canonical_id") != F.col("doc_id")).select("doc_id")
    return docs.select("doc_id").join(drop, "doc_id", "left_anti")


# --- repeated-substring (suffix-array-style) exact dedup -------------------

REPEAT_SPAN_K = 8  # minimum repeated-span length, in tokens


def positional_shingles(docs: DataFrame, k: int = REPEAT_SPAN_K) -> DataFrame:
    """``(doc_id, pos, h)`` for every token position: ``h`` hashes the
    ``k``-token window starting at 1-based ``pos``.  Unlike
    ``shingle_table`` this keeps POSITIONS and duplicates (occurrence
    semantics, not set semantics) — the input to span assembly.  Docs
    shorter than ``k`` tokens contribute nothing (no >= k-token span can
    start in them)."""
    return (
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .select(
            "doc_id", "toks",
            F.explode(
                F.when(
                    F.size("toks") >= k,
                    F.sequence(F.lit(1), F.size("toks") - (k - 1)),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("pos"),
        )
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            md5_hash64(
                F.concat_ws(" ", F.slice(F.col("toks"), F.col("pos"), k))
            ).alias("h"),
        )
    )


def repeated_spans(docs: DataFrame, k: int = REPEAT_SPAN_K) -> DataFrame:
    """Maximal repeated token spans — the arbitrary-span exact-dedup pass
    corpus builds run after fixed-window ``chunk_dedup`` and line-level
    ``drop_boilerplate_lines`` (the suffix-array dedup of Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", re-shaped
    for a distributed engine).  A position is MARKED when its ``k``-token
    window occurs >= 2 times corpus-wide (other docs or elsewhere in the
    same doc); maximal runs of consecutive marked positions become spans
    ``[span_start, span_end]`` (1-based token indexes, inclusive) — every
    ``k``-window inside a span is repeated somewhere, so the span is safe
    to cut.  Returns ``(doc_id, span_start, span_end, span_len)``.

    Scale shape: instead of a global suffix array (a monolithic sort the
    original formulation needs), this is one map-side-combinable
    groupBy(h) occurrence count, one equi-join back on the uniform hash
    key, and per-doc windows partitioned by doc_id — sort + neighborhood
    scan, never pairwise docs.  Collisions of the mod-P hash can
    over-mark a position (~df²/2P expected) — acceptable for a dedup
    pass and engine-identical since the oracle mirrors the same hash; at
    100 TB swap md5_hash64 for full-width xxhash64 (core.py note).

    The shingle table feeds BOTH the count and the mark join; it is
    persisted DISK_ONLY so the corpus is tokenized ONCE (r15 interleaved
    sf1 A/B, median-of-5 in one JVM: recompute 3.71 s / MEMORY_AND_DISK
    2.47 s / DISK_ONLY 2.38 s — DISK_ONLY won every paired round, and
    unlike a memory persist it does not compete with the join/window
    execution memory at scale; opt guide §5).  The cache stays (the
    returned plan reads it); long-lived sessions clear it with
    ``spark.catalog.clearCache()`` — the curation-cache contract.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    sh = positional_shingles(docs, k).persist(StorageLevel.DISK_ONLY)
    occ = (
        sh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= 2)
        .select("h")
    )
    marked = sh.join(occ, "h").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        marked
        .withColumn(
            "new_run",
            F.when(F.col("pos") - F.lag("pos", 1).over(w) == 1, F.lit(0))
            .otherwise(F.lit(1)),
        )
        .withColumn(
            "run_id",
            F.sum("new_run").over(
                w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        runs.groupBy("doc_id", "run_id")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        )
        .select(
            "doc_id",
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long").alias("span_len"),
        )
    )


def drop_repeated_spans(docs: DataFrame,
                        k: int = REPEAT_SPAN_K) -> DataFrame:
    """The corpus after cutting every repeated span: tokens covered by a
    ``repeated_spans`` interval are removed, survivors re-joined with
    single spaces.  Returns ``(doc_id, n_tokens_before, n_tokens_after,
    clean_text)`` for every input doc (docs without repeats pass through
    with equal counts).

    Scale: one groupBy(doc_id) folds a doc's spans into one array (span
    count per doc is bounded by doc length / k), one left join back to
    the corpus, then a per-row higher-order filter — no second shuffle,
    no UDF."""
    spans = repeated_spans(docs, k)
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans"))
    base = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    joined = base.join(per_doc, "doc_id", "left").select(
        "doc_id", "toks",
        F.coalesce(
            F.col("spans"),
            F.array().cast(
                "array<struct<span_start:bigint,span_end:bigint>>"),
        ).alias("spans"),
    )
    indexed = F.transform(
        F.col("toks"),
        lambda t, i: F.struct(t.alias("t"), (i + 1).cast("long").alias("i")),
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            F.col("spans"),
            lambda sp: (s["i"] >= sp["span_start"])
            & (s["i"] <= sp["span_end"]),
        ),
    )
    return joined.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens_before"),
        F.size(kept).cast("long").alias("n_tokens_after"),
        F.concat_ws(
            " ", F.transform(kept, lambda s: s["t"])).alias("clean_text"),
    )
