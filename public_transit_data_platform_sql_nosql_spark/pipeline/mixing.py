"""Corpus mixing and sharding: the stages between a curated corpus and a
training run — temperature-flattened source mixing, deterministic shard
assignment, and a global interleaved training order.

These extend the reference's curation surface (the reference has no
notion of multi-source corpora; its closest analogue is the per-service
filtering in `SQL/app.py` query params) with the operations a
large-scale pretraining pipeline actually runs after curation:

- ``source_mix``    — down-sample over-represented sources so post-mix
                      counts follow ``n_src**alpha`` (alpha = 0.5, the
                      classic square-root temperature flattening).  The
                      acceptance test is PURE INTEGER arithmetic
                      (``h**2 * n_src < M**2 * n_min``), so Spark and
                      DuckDB — and any future engine — agree bit-for-bit
                      with no ``pow``/rounding hazards, and membership is
                      a stable function of (doc_id, per-source count):
                      re-running the pipeline reproduces it exactly.
- ``shard_assign``  — hash docs into ``n_shards`` output shards and
                      number them within each shard; ``order_idx``
                      interleaves the shards round-robin into one global
                      deterministic training order WITHOUT a global sort.
- ``curation_assignments`` — split + mix + shard in ONE closed plan
                      (narrow hash arithmetic + one broadcast join + one
                      window shuffle), the composite the driver checks.

Scale design: ``source_mix`` shuffles only the tiny per-source count
table (map-side combined; sources number in the hundreds, not billions)
and broadcasts it back — the corpus itself is touched by a narrow
projection.  ``shard_assign``'s single shuffle is the per-shard
``row_number`` window whose parallelism equals ``n_shards``: at 100 TB
pick ``n_shards`` around the target output-file count (thousands), which
keeps every window partition at ordinary task size.  Nothing here ever
sorts, joins, or windows over the corpus globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .core import md5_hash64

MIX_SALT = "mix-v1"         # version the mix membership; bump to reshuffle
MIX_RES = 10_000            # hash-position resolution M (rate granularity
                            # 1/M; M**2 * n_src must stay far below 2**63,
                            # which holds to n_src ~ 9e10 docs per source)
SHARD_SALT = "shard-v1"
DEFAULT_N_SHARDS = 8


def _mix_hash(salt: str) -> F.Column:
    return (
        md5_hash64(F.concat(F.lit(salt), F.col("doc_id").cast("string")))
        % MIX_RES
    )


def source_counts(docs: DataFrame,
                  group_col: str = "source") -> DataFrame:
    """Per-source doc count plus the corpus-wide minimum count — the two
    numbers the acceptance threshold needs.  The count aggregate is
    map-side combined on a low-cardinality key; the 1-row min is
    broadcast back onto it, so the result stays a tiny dimension table.
    """
    counts = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_src"))
    # corpus-wide min as an unpartitioned window over the COUNTS table:
    # post-aggregation it holds one row per source (hundreds at most),
    # so the single-partition window is trivially cheap and the plan
    # needs no scalar-subquery join
    return counts.withColumn(
        "n_min", F.min("n_src").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing)))


def source_mix(docs: DataFrame, group_col: str = "source",
               salt: str = MIX_SALT) -> DataFrame:
    """Temperature-flattened source mixing (alpha = 0.5): keep each doc
    of source s with probability ``sqrt(n_min / n_s)``, so post-mix
    source counts are proportional to ``sqrt(n_s)`` — the square-root
    flattening that keeps large sources dominant but bounded.  The
    smallest source is kept whole (rate 1).

    Returns one row per doc: ``(doc_id, <group_col>, n_src, mix_kept)``
    — a flag, not a filter, so the caller can audit rejected docs;
    compose with ``.filter("mix_kept")`` for the mixed corpus.

    The acceptance test ``h^2 * n_src < M^2 * n_min`` (h uniform in
    [0, M)) is exact integer arithmetic — equivalent to
    ``h < M * sqrt(n_min/n_src)`` but with no floating-point anywhere,
    so every engine computes the identical membership.
    """
    rates = source_counts(docs, group_col)
    h = _mix_hash(salt)
    return (
        docs.join(F.broadcast(rates), group_col)
        .select(
            "doc_id",
            group_col,
            "n_src",
            ((h * h * F.col("n_src"))
             < (F.lit(MIX_RES * MIX_RES) * F.col("n_min")))
            .alias("mix_kept"),
        )
    )


def shard_assign(docs: DataFrame, n_shards: int = DEFAULT_N_SHARDS,
                 salt: str = SHARD_SALT) -> DataFrame:
    """Deterministic global shuffle + sharding: every doc gets
    ``(shard_idx, shard_pos, order_idx)`` where ``shard_idx`` is a hash
    bucket, ``shard_pos`` numbers the shard's docs in hash order (the
    pseudo-random permutation WITHIN the shard), and
    ``order_idx = shard_pos * n_shards + shard_idx`` interleaves the
    shards round-robin into one global training order — equivalent in
    distribution to a global pseudo-random permutation, but computed
    with per-shard windows only (parallelism = ``n_shards``; no global
    sort, no single-partition window).

    ``order_idx`` values are unique but not dense (shards differ in size
    by binomial spread, so the tail of the largest shard strides past
    the exhausted ones) — train loops should ORDER BY, not index by it.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = md5_hash64(F.concat(F.lit(salt), F.col("doc_id").cast("string")))
    w = Window.partitionBy("shard_idx").orderBy("h_shard", "doc_id")
    return (
        docs.select("doc_id", h.alias("h_shard"),
                    (h % n_shards).alias("shard_idx"))
        .withColumn("shard_pos",
                    (F.row_number().over(w) - 1).cast("long"))
        .select(
            "doc_id",
            "shard_idx",
            "shard_pos",
            (F.col("shard_pos") * n_shards + F.col("shard_idx"))
            .alias("order_idx"),
        )
    )


def curation_assignments(docs: DataFrame,
                         group_col: str = "source",
                         n_shards: int = DEFAULT_N_SHARDS) -> DataFrame:
    """Split + mix + shard for every doc in ONE closed plan: the
    columns of ``split_assign``, ``source_mix`` and ``shard_assign``
    side by side, so one pass over the corpus materializes every
    assignment a training run needs (and one driver hash pins all three
    memberships).  Plan shape: narrow hash projections + one broadcast
    join (source rates) + one window shuffle (shard numbering).
    """
    from .curation import SPLIT_BUCKETS, SPLIT_SALT, VAL_PERMILLE

    rates = source_counts(docs, group_col)
    bucket = (
        md5_hash64(F.concat(F.lit(SPLIT_SALT),
                            F.col("doc_id").cast("string")))
        % SPLIT_BUCKETS
    )
    hmix = _mix_hash(MIX_SALT)
    hshard = md5_hash64(
        F.concat(F.lit(SHARD_SALT), F.col("doc_id").cast("string")))
    w = Window.partitionBy("shard_idx").orderBy("h_shard", "doc_id")
    return (
        docs.join(F.broadcast(rates), group_col)
        .select(
            "doc_id",
            group_col,
            bucket.alias("bucket"),
            F.when(bucket < VAL_PERMILLE, F.lit("val"))
            .otherwise(F.lit("train")).alias("split"),
            "n_src",
            ((hmix * hmix * F.col("n_src"))
             < (F.lit(MIX_RES * MIX_RES) * F.col("n_min")))
            .alias("mix_kept"),
            hshard.alias("h_shard"),
            (hshard % n_shards).alias("shard_idx"),
        )
        .withColumn("shard_pos",
                    (F.row_number().over(w) - 1).cast("long"))
        .select(
            "doc_id", group_col, "bucket", "split", "n_src", "mix_kept",
            "shard_idx", "shard_pos",
            (F.col("shard_pos") * n_shards + F.col("shard_idx"))
            .alias("order_idx"),
        )
    )


def write_training_shards(docs: DataFrame, path: str,
                          n_shards: int = DEFAULT_N_SHARDS,
                          salt: str = SHARD_SALT) -> None:
    """Materialize ``shard_assign`` as physical shard files: the docs
    land in ``path/shard_idx=NN/`` directories, ONE file per shard,
    rows stored in ``shard_pos`` order — the layout a training loader
    consumes sequentially (read shards round-robin to reproduce
    ``order_idx`` order globally).

    Plan: one repartition on shard_idx (each output file is built by
    exactly one task) + an in-partition sort — no global sort.  At
    100 TB pick ``n_shards`` so a shard is a few GB: the write
    parallelism IS n_shards, same as shard_assign's window.
    """
    assigned = docs.join(shard_assign(docs, n_shards, salt), "doc_id")
    (
        assigned.repartition(n_shards, "shard_idx")
        .sortWithinPartitions("shard_idx", "shard_pos")
        .write.mode("overwrite")
        .partitionBy("shard_idx")
        .parquet(path)
    )


EPOCH_SALT = "epoch-v1"     # version the fractional-copy membership
EPOCH_CAP_PM = 4000         # ceiling: never repeat a source > 4 epochs


def epoch_repeat(docs: DataFrame, epochs: DataFrame,
                 group_col: str = "source",
                 salt: str = EPOCH_SALT) -> DataFrame:
    """UP-sampling mixing: emit each doc ``epochs_pm/1000`` times —
    the with-replacement counterpart of :func:`source_mix` (which can
    only down-sample).  Pretraining mixes express "2.5 epochs of wiki"
    exactly this way; fractional epochs pick the extra copy per doc by
    the same stable-hash discipline as every membership here:

        n_copies = epochs_pm DIV 1000
                 + (1 if md5(salt||doc_id) % 1000 < epochs_pm % 1000)

    so a doc's copy count is a pure function of (doc_id, its source's
    rate) — re-runs reproduce it, and adding other docs never flips it.
    ``epochs`` is a tiny ``(group_col, epochs_pm)`` permille table
    (broadcast); docs from sources absent in it are dropped (rate 0).

    Output adds ``copy_idx`` (0-based) so downstream shard interleaving
    can spread copies across the training order.  Scale: one broadcast
    join + a per-row ``sequence`` explode — fan-out exactly equals the
    intended post-mix row count, no shuffle at all.
    """
    h = md5_hash64(
        F.concat(F.lit(salt), F.col("doc_id").cast("string"))) % 1000
    n = F.expr("epochs_pm DIV 1000").cast("long") + F.when(
        h < F.expr("epochs_pm % 1000"), 1).otherwise(0)
    return (
        docs.join(F.broadcast(epochs), group_col)
        .select(
            "doc_id", group_col, F.col("epochs_pm").cast("long")
            .alias("epochs_pm"), n.alias("n_copies"))
        .select(
            "doc_id", group_col, "epochs_pm",
            F.explode(
                F.when(F.col("n_copies") > 0,
                       F.sequence(F.lit(0).cast("long"),
                                  F.col("n_copies") - 1))
                .otherwise(F.array().cast("array<long>"))
            ).alias("copy_idx"),
        )
    )


def epoch_balance(docs: DataFrame, group_col: str = "source",
                  cap_pm: int = EPOCH_CAP_PM,
                  salt: str = EPOCH_SALT) -> DataFrame:
    """Uniform source balancing by repetition: upsample every source
    toward the LARGEST one (epochs_pm = n_max*1000 DIV n_src, capped at
    ``cap_pm`` — repeating tiny sources more than ~4 epochs hurts more
    than the imbalance does, per the standard data-repetition findings).
    The rate table is the dimension-sized count aggregate + a 1-row max
    broadcast; everything else is :func:`epoch_repeat`.
    """
    counts = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_src"))
    nmax = counts.agg(F.max("n_src").cast("long").alias("n_max"))
    epochs = (
        counts.join(F.broadcast(nmax))
        .select(group_col,
                F.least(F.expr("n_max * 1000 DIV n_src"),
                        F.lit(cap_pm)).cast("long").alias("epochs_pm"))
    )
    return epoch_repeat(docs, epochs, group_col=group_col, salt=salt)
