"""Integer PageRank: hand-computed ground truth, rank-mass properties,
and the planted canonical-vs-copier discrimination."""

from __future__ import annotations

import pyspark.sql.functions as F

from bread_spark.extensions.graph import (
    BASE,
    DAMP_DEN,
    DAMP_NUM,
    PR_ITERS,
    R0,
    authority_rank_df,
    provenance_edges_df,
)
from tests.conftest import SF_DIR


def _reference_rank(n_nodes, edges, iters=PR_ITERS):
    """The same integer recurrence in plain Python — an independent
    implementation the Spark plan must match exactly."""
    ranks = {i: R0 for i in range(n_nodes)}
    tot_w = {}
    for s, _, w in edges:
        tot_w[s] = tot_w.get(s, 0) + w
    for _ in range(iters):
        inc = {}
        for s, d, w in edges:
            share = ranks[s] * DAMP_NUM // DAMP_DEN
            inc[d] = inc.get(d, 0) + share * w // tot_w[s]
        ranks = {i: BASE + inc.get(i, 0) for i in range(n_nodes)}
    return ranks


def test_rank_matches_python_reference_on_small_graph(spark):
    """Star + chain + isolated node: the Spark rank equals the plain-
    Python integer recurrence value for value — bit-exact, including
    the floor-division leaks."""
    edges = [(1, 0, 3), (2, 0, 1), (3, 0, 1), (4, 3, 2), (3, 2, 5)]
    nodes = spark.range(6).select(F.col("id").alias("doc_id"))
    edf = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {
        r["doc_id"]: r["rank_micro"]
        for r in authority_rank_df(nodes, edf).collect()
    }
    assert got == _reference_rank(6, edges)


def test_rank_mass_and_floor_properties(spark):
    """Every rank >= BASE (teleport floor); isolated docs sit exactly
    at BASE; total mass never exceeds n * R0 (floor division only
    leaks, never creates)."""
    from bread_spark.extensions.graph import doc_authority_rank

    rows = doc_authority_rank(spark, SF_DIR).collect()
    n = len(rows)
    assert all(r["rank_micro"] >= BASE for r in rows)
    assert sum(r["rank_micro"] for r in rows) <= n * R0
    iso = [r for r in rows if r["n_out"] == 0 and r["n_in"] == 0]
    assert all(r["rank_micro"] == BASE for r in iso)


def test_canonical_outranks_copiers_on_planted_star(spark):
    """One original doc and four verbatim copies with later ids: every
    shared shingle's canonical is the original, so all edges point at
    it and its rank must dominate each copier's."""
    text = " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(i, text) for i in range(5)], "doc_id long, text string"
    )
    from bread_spark.extensions.dedup import _word_shingles

    edges = provenance_edges_df(_word_shingles(docs))
    e = edges.collect()
    assert {r["dst"] for r in e} == {0}
    assert {r["src"] for r in e} == {1, 2, 3, 4}
    ranks = {
        r["doc_id"]: r["rank_micro"]
        for r in authority_rank_df(docs.select("doc_id"), edges).collect()
    }
    assert all(ranks[0] > ranks[i] for i in range(1, 5))
    # copiers ship everything to the canonical and keep the floor
    assert all(ranks[i] == BASE for i in range(1, 5))


def test_edges_respect_posting_cap_and_direction(spark):
    """Every edge points backward in doc_id (src > dst) and the edge
    fan-in of any canonical through one shingle is bounded by the
    posting cap — checked indirectly: per-src total weight is bounded
    by the doc's shingle count."""
    from bread_spark.extensions.graph import doc_provenance_edges
    from bread_spark.io import load_table

    edges = doc_provenance_edges(spark, SF_DIR)
    assert edges.filter(F.col("src") <= F.col("dst")).count() == 0
    docs = load_table(spark, SF_DIR, "documents")
    n_shingles = docs.select(
        "doc_id",
        (F.size(F.split("text", " ")) - 2).alias("max_sh"),
    )
    over = (
        edges.groupBy("src")
        .agg(F.sum("w").alias("tw"))
        .join(n_shingles, F.col("src") == F.col("doc_id"))
        .filter(F.col("tw") > F.col("max_sh"))
    )
    assert over.count() == 0


# ---------------------------------------------------------------------------
# Label propagation
# ---------------------------------------------------------------------------


def _lp(spark, docs_rows, edge_rows, iters=2):
    from bread_spark.extensions.graph import label_propagation_df

    docs = spark.createDataFrame(docs_rows, "doc_id long, lang string")
    edges = spark.createDataFrame(edge_rows, "src long, dst long, w long")
    return {
        r["doc_id"]: (r["label"], r["origin"])
        for r in label_propagation_df(docs, edges, iters=iters).collect()
    }


def test_label_propagation_hand_computed(spark):
    """Seeds clamp; weight majority beats lexicographic preference;
    exact weight ties resolve to the lexicographically larger label;
    labels reach 2 hops in 2 rounds; isolated nodes stay unlabeled."""
    docs = [(1, "en"), (2, "fr"), (3, "de"), (4, "es"), (7, "fr"), (10, "zh")]
    # seeds: doc_id % 5 < 2 → 1 (en), 10 (zh); non-seed langs are ignored
    edges = [(2, 1, 3), (10, 2, 1), (3, 1, 1), (10, 3, 1), (4, 3, 5)]
    got = _lp(spark, docs, edges)
    assert got[1] == ("en", "seed")
    assert got[10] == ("zh", "seed")
    # en wins by weight 3:1 even though 'zh' > 'en' lexicographically
    assert got[2] == ("en", "propagated")
    # exact tie (en:1, zh:1) → lexicographically larger label
    assert got[3] == ("zh", "propagated")
    # 2-hop spread: node 4's only neighbor was unlabeled in round 1
    assert got[4] == ("zh", "propagated")
    assert got[7] == (None, "unlabeled")


def test_label_propagation_one_round_reaches_one_hop(spark):
    """With iters=1 the 2-hop node must still be unlabeled — the spread
    frontier advances exactly one hop per round."""
    docs = [(1, "en"), (3, "de"), (4, "es")]
    edges = [(3, 1, 1), (4, 3, 1)]
    got = _lp(spark, docs, edges, iters=1)
    assert got[3] == ("en", "propagated")
    assert got[4] == (None, "unlabeled")


def test_label_propagation_real_corpus_origins(spark, sf_dir):
    from bread_spark.extensions.graph import doc_label_propagation
    from bread_spark.io import load_table

    rows = {
        r["doc_id"]: r for r in doc_label_propagation(spark, sf_dir).collect()
    }
    langs = {
        r["doc_id"]: r["lang"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    assert set(rows) == set(langs)
    for doc_id, r in rows.items():
        if doc_id % 5 < 2:
            assert r["origin"] == "seed" and r["label"] == langs[doc_id]
        else:
            assert r["origin"] in ("propagated", "unlabeled")
            assert (r["label"] is None) == (r["origin"] == "unlabeled")


# ---------------------------------------------------------------------------
# Novelty scores
# ---------------------------------------------------------------------------


def test_novelty_hand_computed(spark):
    """First-holder attribution: doc1 originates both its shingles,
    doc2 inherits one of two, doc3 inherits everything."""
    from bread_spark.extensions.graph import novelty_scores_df

    postings = spark.createDataFrame(
        [(1, "s1"), (1, "s2"), (2, "s1"), (2, "s3"), (3, "s2"), (3, "s3")],
        "doc_id long, shingle string",
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty_micro"])
        for r in novelty_scores_df(postings).collect()
    }
    assert got[1] == (2, 2, 1_000_000)
    assert got[2] == (2, 1, 500_000)
    assert got[3] == (2, 0, 0)


def test_novelty_real_corpus_consistency(spark, sf_dir):
    from bread_spark.extensions.graph import doc_novelty_scores

    rows = doc_novelty_scores(spark, sf_dir).collect()
    assert rows
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_shingles"]
        assert r["novelty_micro"] == r["n_novel"] * 1_000_000 // r["n_shingles"]
    # keep-earliest: the globally smallest doc_id in the index is fully novel
    first = min(ids)
    first_row = next(r for r in rows if r["doc_id"] == first)
    assert first_row["novelty_micro"] == 1_000_000


def test_triangle_census_hand_graph(spark):
    """Edges (canonical dst<src): {1,2,3} and {1,2,5} are triangles
    sharing edge (1,2); node 4 hangs off node 1 with no triangle.
    Corner credits and degrees are exact."""
    from bread_spark.extensions.graph import triangle_counts_df

    edges = spark.createDataFrame(
        [(2, 1, 1), (3, 1, 1), (3, 2, 1), (4, 1, 1), (5, 1, 1), (5, 2, 1)],
        "src long, dst long, w long",
    )
    got = {r["doc_id"]: r for r in triangle_counts_df(edges).collect()}
    assert {d: got[d]["n_triangles"] for d in got} == {
        1: 2, 2: 2, 3: 1, 4: 0, 5: 1,
    }
    assert {d: got[d]["degree"] for d in got} == {1: 4, 2: 3, 3: 2, 4: 1, 5: 2}


def test_triangle_census_no_triangles_and_corpus(spark, sf_dir):
    """A path graph has zero triangles everywhere; on the real corpus
    every edge endpoint reports a row and 3·Σtriangles ≡ Σ corner
    credits (each triangle credits exactly 3 corners)."""
    from bread_spark.extensions.graph import (
        provenance_triangles,
        triangle_counts_df,
    )

    path = spark.createDataFrame(
        [(2, 1, 1), (3, 2, 1), (4, 3, 1)], "src long, dst long, w long"
    )
    rows = triangle_counts_df(path).collect()
    assert len(rows) == 4
    assert all(r["n_triangles"] == 0 for r in rows)

    corpus = provenance_triangles(spark, sf_dir).collect()
    assert corpus
    credits = sum(r["n_triangles"] for r in corpus)
    assert credits % 3 == 0  # every triangle credits exactly 3 corners
    assert all(r["degree"] >= 1 for r in corpus)


def test_degree_histogram_hand_computed(spark):
    """Doubling buckets over in/out degrees of a constructed edge
    frame: out-degrees {a:3, b:1}, in-degrees {x:2, y:1, z:1}."""
    from bread_spark.extensions.graph import degree_histogram_df

    edges = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 1), ("a", "z", 1), ("b", "x", 1)],
        "src string, dst string, w bigint",
    )
    got = {
        (r.direction, r.bucket): (r.bucket_lo, r.n_docs)
        for r in degree_histogram_df(edges).collect()
    }
    assert got == {
        ("out", 2): (2, 1),   # a: degree 3 -> bucket len(bin(3))=2
        ("out", 1): (1, 1),   # b: degree 1
        ("in", 2): (2, 1),    # x: degree 2
        ("in", 1): (1, 2),    # y, z: degree 1
    }
