"""Web-provenance curation: the RefinedWeb/C4-class stages that act on
a document's URL rather than its text — URL-canonicalization dedup,
per-domain statistics (the skew screen), per-domain caps, and domain
blocklists.  Consumes the ``docs_web`` view (pipeline/source.py
DOCS_WEB_SQL derives a deterministic URL per doc with the exact
collision/skew structure these operators exist for: one hot host, a
shared registrable domain, a long tail, path collisions, tracking
params).

Everything is a Column expression or a dimension-keyed aggregate:

- URL parsing is three anchored ``regexp_extract``s (scheme+authority,
  pre-query prefix, query string) — no UDF, stays in codegen, and the
  DuckDB oracles evaluate the same regexes.
- Canonicalization drops ``utm_*`` tracking params (the standard
  crawler-dedup normalization) but keeps identifying params — two
  fetches of the same article via different feeds collapse; two
  ``?id=`` pages don't.
- ``domain_stats`` attaches the 1-row corpus total as a broadcast
  scalar (the whitelisted bounded nested-loop shape every corpus-stat
  operator here uses).
- ``domain_cap`` reuses curation.stratified_cap — the hash-position
  prefilter + per-group window that keeps the hot-domain partition
  O(cap), the documented answer to "40% of the crawl is one host".
- ``blocklist_filter`` is a broadcast left-anti join against the
  (tiny) blocked-domain dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .curation import stratified_cap

# host of an http(s) URL: the authority minus any explicit ':port'
# (the capture stops at ':' so 'big.example.com:8080' and
# 'big.example.com' collapse to one host — and so one domain under
# domain_cap/domain_stats); anchored so a '//' later in the path can't
# re-match.  Userinfo ('user@host') is not handled — it does not occur
# in crawl-frontier URLs and a PSL-backed production parser (below)
# would own it.
HOST_RE = r"^https?://([^/?#:]+)"
# registrable domain = last two dot labels (the synthetic corpus uses
# example.{com,org,net}; a production build would swap in a public-
# suffix-list lookup here, same column contract)
REG_DOMAIN_RE = r"([^.]+\.[^.]+)$"

WEB_CAP = 50
BLOCKED_DOMAINS = ("mid.example.org",)


def url_host(url: Column) -> Column:
    return F.regexp_extract(url, HOST_RE, 1)


def registrable_domain(url: Column) -> Column:
    return F.regexp_extract(url_host(url), REG_DOMAIN_RE, 1)


def canonical_url(url: Column) -> Column:
    """The URL with tracking params removed: scheme+host+path plus the
    surviving query params in their original order (no '?' when none
    survive).  ``utm_*`` is the drop class; identifying params (e.g.
    ``id=``) are kept — canonical identity must not merge distinct
    resources."""
    base = F.regexp_extract(url, r"^([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit("")) & ~p.startswith("utm_"),
    )
    return F.when(
        F.size(kept) > 0,
        F.concat(base, F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(base)


def url_dedup(docs_web: DataFrame) -> DataFrame:
    """Keep-one per canonical URL: ``(doc_id, canonical_url, n_copies)``
    where ``doc_id`` is the kept (minimum) id and ``n_copies`` how many
    raw URLs collapsed into it.  One hash-partitioned groupBy on the
    canonical key — the same keep-one shape as exact text dedup, on
    provenance instead of content."""
    return (
        docs_web.select(
            "doc_id", canonical_url(F.col("url")).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").cast("long").alias("doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
        )
        .select("doc_id", "canonical_url", "n_copies")
    )


def domain_stats(docs_web: DataFrame) -> DataFrame:
    """Per registrable domain: doc count, distinct hosts, distinct
    canonical URLs, and integer-permille share of the corpus — the
    pre-flight skew screen a 100-TB crawl runs before committing to any
    per-domain operation (the join_key_profile of the web family).

    The corpus total is a 1-row aggregate attached as a broadcast —
    the classic scalar-subquery plan shape (a constant-key equi-join
    constant-folds back to the same BroadcastNestedLoopJoin, so it is
    declared as what it is and whitelisted as a bounded 1-row
    broadcast, like text.py's corpus stats).
    """
    tagged = docs_web.select(
        registrable_domain(F.col("url")).alias("domain"),
        url_host(F.col("url")).alias("host"),
        canonical_url(F.col("url")).alias("canon"),
    )
    per_dom = tagged.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("host").cast("long").alias("n_hosts"),
        F.countDistinct("canon").cast("long").alias("n_urls"),
    )
    total = tagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"))
    return (
        per_dom.join(F.broadcast(total))
        .select(
            "domain", "n_docs", "n_hosts", "n_urls",
            F.expr("n_docs * 1000 DIV n_total").cast("long")
            .alias("share_pm"),
        )
    )


def domain_cap(docs_web: DataFrame, cap: int = WEB_CAP) -> DataFrame:
    """At most ``cap`` docs per registrable domain, chosen as the same
    deterministic hash-ordered sample as curation.stratified_cap (which
    this delegates to, with the domain as the stratum): the standard
    web-pipeline guard against one hot host dominating the corpus.
    Returns ``(doc_id, domain, pos, sample_rank)``."""
    with_dom = docs_web.withColumn(
        "domain", registrable_domain(F.col("url")))
    return stratified_cap(with_dom, cap=cap, group_col="domain")


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a hostname (``m0.mid.example.org`` ->
    [m0.mid.example.org, mid.example.org, example.org, org]) — bounded
    by label count (~5), the standard trick that turns suffix matching
    into an equi-join."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n - i + 1), "."),
    )


def blocklist_filter(docs_web: DataFrame,
                     blocked=BLOCKED_DOMAINS) -> DataFrame:
    """Drop every doc whose host IS or is UNDER a blocklisted domain
    (dot-suffix semantics: blocking ``mid.example.org`` takes out
    ``m0.mid.example.org`` but not ``pyramid.example.org``).

    Suffix matching scales as an EQUI-join, not a per-entry endswith
    scan: each host explodes into its <= ~5 dot-suffixes, which
    equi-join the broadcast blocked dimension — one hash probe per
    suffix regardless of blocklist size (an endswith condition join
    would be a nested loop over the whole list; an IN-list literal
    stops being a plan at ~10k entries).  Returns the surviving docs
    with their ``host``."""
    spark = docs_web.sparkSession
    blocked_df = spark.createDataFrame(
        [(d,) for d in blocked], "sfx string")
    with_host = docs_web.select(
        "doc_id", "url", url_host(F.col("url")).alias("host"))
    hit = (
        with_host.select(
            "doc_id",
            F.explode(host_suffixes(F.col("host"))).alias("sfx"))
        .join(F.broadcast(blocked_df), "sfx")
        .select("doc_id")
    )
    return with_host.join(hit, "doc_id", "left_anti")
