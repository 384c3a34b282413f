"""Pipeline inputs: the driver's ``documents`` / ``embeddings`` parquet
plus a deterministic near-duplicate augmentation.

The raw synthetic corpus contains no duplicate texts, so the dedup
operators would all (correctly) return empty results.  ``docs_aug``
appends a perturbed copy of every 7th document — same text plus a marker
suffix — giving the dedup family real positives with known provenance
(pair (d, d+1_000_000) must be found).  The SQL template is dialect-free
and is evaluated by BOTH Spark and DuckDB so the differential oracle sees
the identical derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tpch_adapter import register_tpch

AUG_OFFSET = 1_000_000

DOCS_AUG_SQL = """
SELECT doc_id, text, lang, source, n_chars FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id,
       text || ' near dup marker token' AS text,
       lang, source, n_chars + 22 AS n_chars
FROM documents WHERE doc_id % 7 = 0
"""

# every 5th vector gets a slightly-perturbed copy (deterministic noise,
# cosine ~0.999 to its source) — the raw synthetic embeddings top out at
# within-label cosine ~0.45, so without augmentation "near-dup" would be
# vacuous.  {transform}/{upper} are the only dialect substitutions
# (transform/sequence in Spark, list_transform/range upper-exclusive in
# DuckDB).
EMB_AUG_SQL = """
SELECT vec_id, embedding, label FROM embeddings
UNION ALL
SELECT vec_id + 1000000 AS vec_id,
       {transform}({rng}, d ->
         CAST({elem} AS DOUBLE)
         + CAST(0.01 AS DOUBLE) * (CAST((vec_id + d) % 7 AS DOUBLE) - 3.0))
         AS embedding,
       label
FROM embeddings WHERE vec_id % 5 = 0
"""

# deterministic per-doc URL: the raw corpus has no provenance column, so
# the web-curation family (pipeline/web.py) derives one the same way
# docs_aug derives its dup pairs — a dialect-free expression BOTH engines
# evaluate, with the skew/collision structure the operators exist for:
#   - 40% of docs on ONE hot host (domain_cap / domain_stats skew case),
#   - 30% across 3 hosts under a shared registrable domain
#     (suffix-blocklist case),
#   - 30% across a 211-host long tail,
#   - paths collide on doc_id % 400 (aug copies land in their source's
#     class: 1e6 % 400 = 0) and ~40% of urls carry a query string, utm
#     tracking or a real id param (url-canonicalization dedup case).
DOCS_WEB_SQL = """
SELECT doc_id, text, lang, source, n_chars,
       'https://'
       || CASE WHEN doc_id % 10 < 4 THEN 'big.example.com'
               WHEN doc_id % 10 < 7 THEN
                 'm' || CAST(doc_id % 3 AS STRING) || '.mid.example.org'
               ELSE 'site-' || CAST(doc_id % 211 AS STRING)
                    || '.example.net'
          END
       || '/' || source || '/doc/' || CAST(doc_id % 400 AS STRING)
       || CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&utm_medium=rss'
               WHEN doc_id % 5 = 1 THEN
                 '?id=' || CAST(doc_id % 97 AS STRING)
               ELSE '' END AS url
FROM docs_aug
"""

# Spark brackets are 0-based (GetArrayItem) while DuckDB's are 1-based,
# so the element access is dialect-substituted alongside the range.
_EMB_AUG_SPARK = EMB_AUG_SQL.format(transform="transform",
                                    rng="sequence(1, 64)",
                                    elem="element_at(embedding, d)")
_EMB_AUG_DUCK = EMB_AUG_SQL.format(transform="list_transform",
                                   rng="range(1, 65)",
                                   elem="embedding[d]")


def register_pipeline_views(spark: SparkSession,
                            sf_dir: str) -> dict[str, DataFrame]:
    """Register ``documents``/``embeddings`` raw views plus the augmented
    ``docs_aug``/``emb_aug``; returns all four DataFrames."""
    out = register_tpch(spark, sf_dir, ("documents", "embeddings"))
    for name, sql in (("docs_aug", DOCS_AUG_SQL),
                      ("docs_web", DOCS_WEB_SQL),
                      ("emb_aug", _EMB_AUG_SPARK)):
        df = spark.sql(sql)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


EMB_AUG_DUCK_CTE = f"emb_aug AS ({_EMB_AUG_DUCK})"
DOCS_WEB_CTE = f"docs_web AS ({DOCS_WEB_SQL})"


def duckdb_docs_cte() -> str:
    return f"WITH docs_aug AS ({DOCS_AUG_SQL})"
