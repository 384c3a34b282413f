"""dedup_clusters (connected components): cross-check the distributed
min-label propagation against a plain-Python union-find on the same edge
list — exact semantics, since no SQL oracle can express the fixpoint."""

from __future__ import annotations

from public_transit_data_platform_sql_nosql_spark.pipeline import dedup


def _union_find(edges: list[tuple]) -> dict:
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min member of each component
    return {x: find(x) for x in parent}


def test_clusters_match_union_find(spark):
    edges = [("d1", "d2"), ("d2", "d3"), ("d5", "d4"),
             ("d7", "d8"), ("d8", "d7"),           # dup edge both ways
             ("d9", "d9"),                          # self loop dropped
             ("a1", "a2"), ("a2", "a3"), ("a3", "a4"), ("a4", "a5")]
    pairs = spark.createDataFrame(edges, "doc_a string, doc_b string")
    got = {r["doc_id"]: r["canonical_id"]
           for r in dedup.dedup_clusters(pairs).collect()}
    want = _union_find([e for e in edges if e[0] != e[1]])
    assert got == want
    # chain a1..a5 collapses to a single canonical
    assert {got[f"a{i}"] for i in range(1, 6)} == {"a1"}


def test_clusters_reliable_checkpoint_matches_local(spark, tmp_path):
    """checkpoint_dir switches the lineage cap to reliable checkpoint():
    labels must be identical to the localCheckpoint path, and checkpoint
    files must actually land in the directory (a 13-node chain needs ~12
    rounds, so the every-3rd-round checkpoint fires several times)."""
    import os

    edges = [(f"d{i:02d}", f"d{i + 1:02d}") for i in range(12)]
    pairs = spark.createDataFrame(edges, "doc_a string, doc_b string")
    base = {r["doc_id"]: r["canonical_id"]
            for r in dedup.dedup_clusters(pairs).collect()}
    ckdir = str(tmp_path / "ck")
    rel = {r["doc_id"]: r["canonical_id"]
           for r in dedup.dedup_clusters(
               pairs, checkpoint_dir=ckdir).collect()}
    assert rel == base
    assert base == {f"d{i:02d}": "d00" for i in range(13)}
    ck_files = [os.path.join(dp, f)
                for dp, _, fs in os.walk(ckdir) for f in fs]
    assert ck_files, "reliable checkpoint wrote nothing"


def test_clusters_on_real_minhash_pairs(spark):
    from tests.conftest import SF_DIR
    import __spark_entry__ as E

    pairs = E.queries()["dedup_minhash_lsh"](spark, SF_DIR)
    labels = dedup.dedup_clusters(pairs)
    rows = labels.collect()
    docs = {r["doc_id"] for r in rows}
    # every doc in a pair is labeled, canonical is a member doc <= doc_id
    assert all(r["canonical_id"] <= r["doc_id"] for r in rows)
    assert {r["canonical_id"] for r in rows} <= docs

    # keep-one = full corpus minus the non-canonical cluster members
    corpus = E._aug(spark, SF_DIR)
    kept = {r["doc_id"]
            for r in dedup.keep_canonical(corpus, labels).collect()}
    all_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    dropped = {r["doc_id"] for r in rows if r["canonical_id"] != r["doc_id"]}
    assert kept == all_ids - dropped


def test_clusters_checkpoint_rounds_self_clean(spark, tmp_path):
    """VERDICT r4 item 7: reliable-checkpoint rounds must not accumulate —
    each round deletes the previous round's directory once it has
    materialized, so a converged run leaves AT MOST one round's files,
    and the returned frame (backed by that surviving round) still reads."""
    edges = [(f"d{i:02d}", f"d{i + 1:02d}") for i in range(12)]
    pairs = spark.createDataFrame(edges, "doc_a string, doc_b string")
    ckdir = tmp_path / "ck"
    labels = dedup.dedup_clusters(pairs, checkpoint_dir=str(ckdir))
    rounds = sorted(p.name for p in ckdir.iterdir())
    assert len(rounds) == 1, rounds
    got = {r["doc_id"]: r["canonical_id"] for r in labels.collect()}
    assert got == {f"d{i:02d}": "d00" for i in range(13)}
