"""Text-cleaning operators: the in-place document repairs that run
before chunking — intra-doc repetition collapse and PII redaction.

Both are NARROW per-row Column expressions (no shuffle, no UDF): the
whole pass is a projection that Catalyst fuses into the scan, so at
100 TB cleaning costs one codegen'd map over the corpus.  Every
transformation has a DuckDB list/regex mirror (pipeline/oracles.py) so
the outputs stay hash-checked.

- ``collapse_token_runs`` — collapse immediate token repetitions
  ("batch batch batch" -> "batch"), the cheap degenerate-repetition
  cleanup (stuck generation loops, copy-paste stutter) that runs before
  any n-gram stage so repeated runs can't masquerade as content.
- ``scrub_pii`` — redact emails / IPv4s / international phone numbers
  with typed placeholder tokens and per-kind counts.  Patterns are
  deliberately RE2-safe (no backreferences, no lookaround) so the same
  regex means the same thing in Spark (Java regex), DuckDB (RE2), and
  most other engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .core import md5_hash64, tokens

# corpus-level line dedup: a line must appear in at least this many
# distinct documents to be treated as boilerplate and dropped
LINE_MIN_DF = 3

# RE2-safe patterns (also valid Java regex with identical semantics)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{7,15}"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def collapse_token_runs(docs: DataFrame) -> DataFrame:
    """One row per doc: ``(doc_id, n_before, n_after, clean_text)`` with
    immediate token repetitions collapsed to a single occurrence.
    Pure array expressions (tokenize -> keep tokens that differ from
    their predecessor -> rejoin); the k-th repetition is dropped
    whatever k is, non-adjacent repeats are untouched.
    """
    toks = tokens(F.col("text"))
    # index-aware filter: keep position i iff i == 0 or the token
    # differs from its predecessor.  F.get is 0-based and null-safe, and
    # (i == 0) short-circuits the boolean OR for the first element;
    # empty arrays filter to empty with no index arithmetic at all.
    kept = F.filter(
        "_toks",
        lambda x, i: (i == F.lit(0)) | (x != F.get("_toks", i - 1)))
    return (
        docs.select("doc_id", toks.alias("_toks"))
        .select(
            "doc_id",
            F.size("_toks").cast("long").alias("n_before"),
            kept.alias("_kept"),
        )
        .select(
            "doc_id", "n_before",
            F.size("_kept").cast("long").alias("n_after"),
            F.concat_ws(" ", "_kept").alias("clean_text"),
        )
    )


def scrub_pii(docs: DataFrame) -> DataFrame:
    """One row per doc: ``(doc_id, n_emails, n_ips, n_phones,
    clean_text)`` — redaction applied email -> IP -> phone, each count
    measured on the text AS THE CHAIN SEES IT (emails on the original,
    IPs after email redaction, phones after both).  The stages CAN
    overlap — PHONE_RE matches the digit run inside an email local part
    like ``user+41791234567@example.com`` — so counting every pattern on
    the original text would report a "phone" the chain never redacts;
    staged counts keep ``n_<kind>`` == occurrences of ``<KIND>`` token
    in ``clean_text`` minus pre-existing literals, reconcilable."""
    t = F.col("text")
    after_email = F.regexp_replace(t, F.lit(EMAIL_RE), F.lit(EMAIL_TOKEN))
    after_ip = F.regexp_replace(after_email, F.lit(IPV4_RE),
                                F.lit(IPV4_TOKEN))
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(after_email, F.lit(IPV4_RE)).cast("long")
        .alias("n_ips"),
        F.regexp_count(after_ip, F.lit(PHONE_RE)).cast("long")
        .alias("n_phones"),
        F.regexp_replace(after_ip, F.lit(PHONE_RE), F.lit(PHONE_TOKEN))
        .alias("clean_text"),
    )


def drop_boilerplate_lines(docs: DataFrame,
                           min_df: int = LINE_MIN_DF) -> DataFrame:
    """Corpus-level LINE deduplication (the C4/RefinedWeb "remove
    repeated lines" pass): a line occurring in >= ``min_df`` distinct
    documents is boilerplate (nav menus, cookie banners, footers) and is
    removed from EVERY document; each document's survivors are rejoined
    in their original order.

    Returns one row per doc: ``(doc_id, n_lines, n_removed,
    clean_text)`` — docs whose every line is boilerplate keep their row
    with an empty ``clean_text`` (they are downstream length-filter
    fodder, not silent drops).

    Scale shape (this is a global operator, unlike the narrow cleaners
    above): posexplode lines -> distinct (line_hash, doc) -> count
    distinct docs per line hash (two map-side-combined aggregations, so
    a line repeated inside one hot document reaches the shuffle once)
    -> left join the hot-line set back on ``line_hash`` -> one per-doc
    aggregation rebuilding the text via array_sort(collect_list(struct))
    on the line index.  The hot-line table is the join's build side and
    is df-filtered first; a corpus-wide banner is ONE row there, so the
    join fans out, never multiplies.  Line identity is the 64-bit
    md5-derived hash — at 100 TB swap for full xxhash64(line) if the
    ~1e-10 collision odds at mod-P matter.
    """
    if min_df < 2:
        raise ValueError(f"min_df must be >= 2, got {min_df!r}")
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), "\n")).alias("idx", "line"),
    ).withColumn("line_hash", md5_hash64(F.col("line")))
    hot = (
        lines.select("line_hash", "doc_id").distinct()
        .groupBy("line_hash")
        .agg(F.count(F.lit(1)).cast("long").alias("line_df"))
        .filter(F.col("line_df") >= min_df)
        .select("line_hash", F.lit(True).alias("_hot"))
    )
    tagged = lines.join(hot, "line_hash", "left")
    kept_struct = F.when(
        F.col("_hot").isNull(),
        F.struct(F.col("idx"), F.col("line")),
    )
    return (
        tagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.when(F.col("_hot").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_removed"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["line"],
                ),
            ).alias("clean_text"),
        )
        .select("doc_id", "n_lines", "n_removed", "clean_text")
    )
