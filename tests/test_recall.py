"""Recall quality gates for the approximate operators: rows-only checks
verify shape; these verify the approximation is actually good."""

from __future__ import annotations

from bread_spark.queries import QUERIES
from tests.conftest import SF_DIR


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    """Every exact word-3-gram Jaccard ≥ 0.5 pair must surface as an LSH
    candidate (8 bands × 4 rows targets exactly this threshold)."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["ngram_jaccard_pairs"](spark, SF_DIR).collect()
    }
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["minhash_lsh_candidates"](spark, SF_DIR).collect()
    }
    assert exact, "fixture corpus should contain near-duplicate pairs"
    recall = len(exact & cands) / len(exact)
    assert recall >= 0.95, f"minhash-LSH recall {recall:.2f}"


def test_ann_recall_vs_exact_topk(spark):
    """Multi-table hyperplane LSH must recover a substantial fraction of
    the exact top-k. Uniform-random embeddings are LSH's worst case
    (true neighbors sit at ~60-70°); 16 tables × 6 bits measures ~0.55
    here and far higher on clustered real embeddings. Deterministic
    planes + data → stable assertion."""
    exact = {
        (r["query_id"], r["vec_id"])
        for r in QUERIES["cosine_topk"](spark, SF_DIR).collect()
    }
    ann = {
        (r["query_id"], r["vec_id"])
        for r in QUERIES["lsh_bucket_topk"](spark, SF_DIR).collect()
    }
    recall = len(exact & ann) / len(exact)
    assert recall >= 0.4, f"ANN recall {recall:.2f}"


def test_capped_jaccard_recall_vs_uncapped(spark):
    """The production (max_df-capped) jaccard plan must recover nearly all
    uncapped pairs on this corpus — near-dup pairs share mostly rare
    shingles, so removing hot shingles barely moves the score."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["ngram_jaccard_pairs"](spark, SF_DIR).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["ngram_jaccard_pairs_capped"](spark, SF_DIR).collect()
    }
    assert exact, "fixture corpus should contain near-duplicate pairs"
    recall = len(exact & capped) / len(exact)
    assert recall >= 0.9, f"capped jaccard recall {recall:.2f}"


def test_capped_posting_plan_matches_selfjoin(spark):
    """The posting-list capped alternative must be value-identical to the
    benched self-join path with the same cap — same pairs, same rounded
    jaccard scores."""
    from bread_spark.extensions.dedup import (
        MAX_DF,
        _jaccard_posting_capped,
    )
    from bread_spark.io import load_table

    selfjoin = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in QUERIES["ngram_jaccard_pairs_capped"](spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents")
    posting = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in _jaccard_posting_capped(docs, 0.5, MAX_DF).collect()
    }
    assert posting == selfjoin


def test_lsh_bucket_pairs_vs_brute_force(spark):
    """The distributed near-dup path must (a) emit ONLY true pairs — exact
    in-bucket re-scoring makes precision 1.0, so output ⊆ brute force —
    and (b) recover a substantial fraction of them. Deterministic planes
    + data → stable assertion."""
    exact = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in QUERIES["embedding_cosine_dups"](spark, SF_DIR).collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in QUERIES["lsh_bucket_pairs"](spark, SF_DIR).collect()
    }
    assert exact, "fixture corpus should contain near-dup pairs"
    assert set(lsh) <= set(exact), "false positives: LSH pair not in brute force"
    for pair, cos in lsh.items():
        assert cos == exact[pair]  # same rounded exact score
    recall = len(lsh) / len(exact)
    assert recall >= 0.4, f"lsh_bucket_pairs recall {recall:.2f}"


def test_lsh_bucket_pairs_plan_is_distributed(spark):
    """Scale-safety: no driver collect (the plan is a pure scan→map→
    group→map chain) and no cartesian product."""
    plan = (
        QUERIES["lsh_bucket_pairs"](spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan  # in-bucket scoring
    # exactly the two expected exchanges: groupBy(table,bucket) + distinct
    assert plan.count("Exchange hashpartitioning") == 2


def test_ivf_recall_vs_exact_topk(spark):
    """IVF coarse quantizer (32 centroids, probe 8) must recover most of
    the exact top-k — measured 0.94 at sf0.001 / 0.86 at sf0.01;
    deterministic init + data → stable assertion."""
    exact = {
        (r["query_id"], r["vec_id"])
        for r in QUERIES["cosine_topk"](spark, SF_DIR).collect()
    }
    ivf = {
        (r["query_id"], r["vec_id"])
        for r in QUERIES["ivf_topk"](spark, SF_DIR).collect()
    }
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.6, f"IVF recall {recall:.2f}"


def test_dedup_clusters_partition_properties(spark):
    """Clusters must form a partition consistent with the pair graph:
    every pair lands in one cluster; canonical = min member."""
    pairs = QUERIES["ngram_jaccard_pairs"](spark, SF_DIR).collect()
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in QUERIES["dedup_clusters"](spark, SF_DIR).collect()
    }
    for p in pairs:
        assert labels[p["doc_a"]] == labels[p["doc_b"]]
    members: dict[int, list[int]] = {}
    for d, c in labels.items():
        members.setdefault(c, []).append(d)
    for c, ds in members.items():
        assert c == min(ds)  # canonical is the min doc_id of its component


def test_lsh_bucket_pairs_cap_bounds_degenerate_bucket(spark):
    """Adversarial skew: an all-identical corpus lands every vector in
    the same bucket of every table — m²/2 pairs without the cap. With
    max_bucket below m the degenerate buckets are dropped (bounded work);
    vectors outside the hot bucket still pair normally."""
    from bread_spark.extensions.similarity import lsh_bucket_pairs_df

    n = 200
    rows = [(i, [1.0] * 64) for i in range(n)]  # identical → one bucket
    rows += [(1000, [1.0, -1.0] * 32), (1001, [1.0, -1.0] * 32)]  # a separate pair
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    capped = lsh_bucket_pairs_df(emb, threshold=0.9, max_bucket=50).collect()
    pairs = {(r["vec_a"], r["vec_b"]) for r in capped}
    # the degenerate 200-vector bucket is skipped entirely...
    assert not any(a < 1000 and b < 1000 for a, b in pairs)
    # ...but the small bucket still produces its true pair
    assert (1000, 1001) in pairs

    # and with the cap off, the quadratic pair set does materialize
    uncapped = lsh_bucket_pairs_df(emb, threshold=0.9, max_bucket=None)
    assert uncapped.count() == n * (n - 1) // 2 + 1


def test_lsh_bucket_pairs_tiling_is_exact(spark, monkeypatch):
    """Blocked in-bucket scoring (ADVICE r2 #2) must emit the identical
    pair set whether a bucket is scored in one block or many tiny tiles
    — tiling bounds memory, never changes math."""
    from bread_spark.extensions import similarity

    n = 40
    rows = [(i, [1.0] * 64) for i in range(n)]  # one dense 40-vector bucket
    rows += [(1000, [1.0, -1.0] * 32), (1001, [1.0, -1.0] * 32)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def run():
        return sorted(
            (r["vec_a"], r["vec_b"], r["cosine"])
            for r in similarity.lsh_bucket_pairs_df(
                emb, threshold=0.9, max_bucket=None
            ).collect()
        )

    one_block = run()
    monkeypatch.setattr(similarity, "BUCKET_SCORE_TILE", 3)
    many_tiles = run()
    assert many_tiles == one_block
    assert len(one_block) == n * (n - 1) // 2 + 1


def test_lsh_topk_collects_cleanly(spark):
    """Regression: the earlier broadcast-join formulation passed count()
    but failed collect() with a Catalyst attribute-binding internal
    error — keep a collect in the suite."""
    rows = QUERIES["lsh_bucket_topk"](spark, SF_DIR).collect()
    assert all(r["rank"] >= 1 and r["cosine"] is not None for r in rows)


def test_embedding_dedup_corpus_is_canonical_cover(spark):
    """Semantic-dedup survivors = exactly the min-vec_id member of every
    cosine-dup component; sizes sum to the full corpus; transitive
    closure is honored (a~b, b~c collapse even when a is not a direct
    dup of c)."""
    from bread_spark.extensions.dedup import connected_components
    from bread_spark.extensions.similarity import (
        embedding_cosine_dups,
        embedding_dedup_corpus,
    )
    from bread_spark.io import load_table
    from pyspark.sql import functions as F

    nodes = (
        load_table(spark, SF_DIR, "embeddings")
        .select(F.col("vec_id").alias("doc_id"))
    )
    pairs = embedding_cosine_dups(spark, SF_DIR).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    comp = connected_components(nodes, pairs).collect()
    canonical = {r["doc_id"] for r in comp if r["is_canonical"]}

    survivors = embedding_dedup_corpus(spark, SF_DIR).collect()
    assert {r["vec_id"] for r in survivors} == canonical
    assert sum(r["cluster_size"] for r in survivors) == len(comp)
    assert all(r["n_dups_removed"] == r["cluster_size"] - 1 for r in survivors)


def test_quantize_embeddings_range_and_reconstruction(spark):
    """int8 quantization contract: |q| ≤ 127, the max-|x| element of every
    dimension hits ±127 exactly, and dequantization error is bounded by
    half a quantization step (scale/254) per element."""
    from bread_spark.extensions.similarity import quantize_embeddings
    from bread_spark.io import load_table

    sf = SF_DIR
    q = {r["vec_id"]: r["q"] for r in quantize_embeddings(spark, sf).collect()}
    emb = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, sf, "embeddings").collect()
    }
    dims = len(next(iter(emb.values())))
    scales = [max(abs(v[d]) for v in emb.values()) for d in range(dims)]
    hit_limit = [False] * dims
    for vid, vec in emb.items():
        for d in range(dims):
            qv = q[vid][d]
            assert -127 <= qv <= 127
            if scales[d] == 0:
                assert qv == 0
                continue
            step = scales[d] / 127.0
            assert abs(vec[d] - qv * step) <= step / 2 + 1e-9, (vid, d)
            if abs(qv) == 127:
                hit_limit[d] = True
    assert all(hit_limit)  # every dimension's extreme maps to the rail


def test_quantized_topk_preserves_float_topk(spark):
    """The point of int8 quantization is that ANN over quantized vectors
    ranks (almost) like ANN over floats. Synthetic near-uniform vectors
    are the worst case (neighbor similarities are near-tied, so ±half-step
    noise reorders the tail), so the pinned contract is the one real ANN
    systems use — quantized over-fetch + float re-rank: the true float
    top-10 must sit inside the quantized top-20 with ≥95% mean recall,
    and each vector's true nearest neighbor inside its quantized top-5
    ≥95% of the time."""
    import numpy as np

    from bread_spark.extensions.similarity import quantize_embeddings
    from bread_spark.io import load_table

    emb_rows = sorted(
        load_table(spark, SF_DIR, "embeddings").collect(), key=lambda r: r["vec_id"]
    )
    q_rows = {r["vec_id"]: r["q"] for r in quantize_embeddings(spark, SF_DIR).collect()}
    ids = [r["vec_id"] for r in emb_rows]
    X = np.array([r["embedding"] for r in emb_rows], dtype=np.float64)
    Q = np.array([q_rows[i] for i in ids], dtype=np.float64)

    def sims(M):
        n = M / np.linalg.norm(M, axis=1, keepdims=True)
        S = n @ n.T
        np.fill_diagonal(S, -np.inf)
        return S

    tf = np.argsort(-sims(X), axis=1)
    tq = np.argsort(-sims(Q), axis=1)
    overfetch = np.mean(
        [len(set(a[:10]) & set(b[:20])) / 10 for a, b in zip(tf, tq)]
    )
    assert overfetch >= 0.95, overfetch
    nn_hit = np.mean([a[0] in set(b[:5]) for a, b in zip(tf, tq)])
    assert nn_hit >= 0.95, nn_hit


def test_cluster_quota_sample_bounds_every_cluster(spark):
    """Diversity sampling contract: ≤ quota vectors per learned cluster,
    every non-empty cluster represented, assignment deterministic across
    runs, and survivors are a subset of the corpus."""
    from collections import Counter

    from bread_spark.extensions.similarity import (
        CLUSTER_QUOTA,
        cluster_quota_sample,
    )
    from bread_spark.io import load_table

    rows = cluster_quota_sample(spark, SF_DIR).collect()
    again = cluster_quota_sample(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    per_cluster = Counter(r["cluster"] for r in rows)
    assert max(per_cluster.values()) <= CLUSTER_QUOTA
    all_ids = {r["vec_id"] for r in load_table(spark, SF_DIR, "embeddings").collect()}
    assert {r["vec_id"] for r in rows} <= all_ids
    # the cap actually binds on this corpus (500 vecs / 32 clusters)
    assert any(v == CLUSTER_QUOTA for v in per_cluster.values())


def test_minhash_dedup_corpus_partition_cover_and_exact_agreement(spark):
    """The LSH-graph deduped corpus must be a partition cover (every doc
    absorbed into exactly one surviving cluster), deterministic, and in
    ≥95% survivor-set agreement with the exact-jaccard corpus — banding
    can merge a few extra (or miss a few) clusters, never restructure
    the corpus wholesale."""
    from bread_spark.extensions.dedup import deduped_corpus, minhash_dedup_corpus
    from bread_spark.io import load_table

    n_docs = load_table(spark, SF_DIR, "documents").count()
    rows = minhash_dedup_corpus(spark, SF_DIR).collect()
    assert sum(r["cluster_size"] for r in rows) == n_docs
    again = {r["doc_id"] for r in minhash_dedup_corpus(spark, SF_DIR).collect()}
    approx = {r["doc_id"] for r in rows}
    assert approx == again
    exact = {r["doc_id"] for r in deduped_corpus(spark, SF_DIR).collect()}
    jac = len(approx & exact) / len(approx | exact)
    assert jac >= 0.95, jac


def test_cross_dedup_neardup_gates_fuzzy_and_exact(spark):
    """The fuzzy incremental gate: exact dups of base content always
    dropped (identical text → identical signature → every band collides),
    near-identical content dropped, unrelated content survives; on the
    real corpus its survivors are a subset of the exact gate's and the
    assignment is deterministic."""
    from bread_spark.extensions.dedup import (
        cross_dedup,
        cross_dedup_neardup,
        cross_dedup_neardup_df,
    )

    base_text = " ".join(f"w{i}" for i in range(40))
    near = " ".join(("CHANGED" if i == 7 else f"w{i}") for i in range(40))
    novel = " ".join(f"z{i}" for i in range(40))
    base = spark.createDataFrame(
        [(0, "s", "en", base_text)], "doc_id long, source string, lang string, text string"
    )
    new = spark.createDataFrame(
        [(10, "s", "en", base_text), (11, "s", "en", near), (12, "s", "en", novel)],
        "doc_id long, source string, lang string, text string",
    )
    kept = sorted(r["doc_id"] for r in cross_dedup_neardup_df(base, new).collect())
    assert kept == [12]  # exact AND near dup gated; novel survives

    fuzzy = {r["doc_id"] for r in cross_dedup_neardup(spark, SF_DIR).collect()}
    again = {r["doc_id"] for r in cross_dedup_neardup(spark, SF_DIR).collect()}
    assert fuzzy == again
    exact = {r["doc_id"] for r in cross_dedup(spark, SF_DIR).collect()}
    assert fuzzy <= exact  # the fuzzy gate can only drop MORE


def test_jl_projection_preserves_distances(spark):
    """JL contract of `project_embeddings`: the ±1/sqrt(k) Rademacher
    projection is unbiased for squared distances — E‖P(a−b)‖² = ‖a−b‖².
    Over 100 deterministic pairs the per-pair ratio concentrates with
    std ≈ sqrt(2/k) ≈ 0.35, so the mean over pairs must land well inside
    [0.8, 1.2] (±5σ of the pair-mean) and no ratio may collapse to 0."""
    import math

    from bread_spark.extensions.similarity import (
        PROJ_OUT_DIMS,
        project_embeddings,
    )
    from bread_spark.io import load_table

    emb = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    }
    proj_rows = project_embeddings(spark, SF_DIR).collect()
    proj: dict[int, list[float]] = {}
    for r in proj_rows:
        proj.setdefault(r["vec_id"], [0.0] * PROJ_OUT_DIMS)[r["out_dim"]] = r[
            "proj_val"
        ]

    ids = sorted(emb)
    pairs = [(ids[i], ids[(i * 37 + 11) % len(ids)]) for i in range(100)]
    ratios = []
    for a, b in pairs:
        if a == b:
            continue
        d2 = sum((x - y) ** 2 for x, y in zip(emb[a], emb[b]))
        p2 = sum((x - y) ** 2 for x, y in zip(proj[a], proj[b]))
        assert d2 > 0
        ratios.append(p2 / d2)
    mean = sum(ratios) / len(ratios)
    assert 0.8 <= mean <= 1.2, mean
    assert min(ratios) > 0.05  # no pair collapses to (near-)zero


def test_jl_projection_sign_matrix_is_balanced(spark):
    """The md5-parity sign matrix should be ~half +1 per output column
    (a grossly unbalanced column would bias that projection toward the
    input sum); with 64 Bernoulli(1/2) draws, [16, 48] is a ±4σ band."""
    from bread_spark.extensions.similarity import projection_sign_arrays

    for col in projection_sign_arrays():
        plus = sum(1 for s in col if s > 0)
        assert 16 <= plus <= 48, plus


def test_jl_projected_retrieval_beats_chance(spark):
    """Retrieval utility of `project_embeddings`: rank the corpus by
    distance in the 16-dim projected space, keep the top-100 candidates,
    exact-re-rank to 5 — recall vs the exact cosine top-5 must be ≥ 0.5
    on this corpus (observed 0.64) and well above the ≈0.2 chance rate of
    a random 100-of-500 candidate set. Uniform-random embeddings are the
    JL worst case (all pairs nearly equidistant) — real clustered
    embeddings separate far better; same caveat as the LSH/IVF recall
    tests. Deterministic end to end: fixed matrix, fixed corpus."""
    import numpy as np

    from bread_spark.extensions.similarity import (
        PROJ_OUT_DIMS,
        project_embeddings,
    )
    from bread_spark.io import load_table

    rows = sorted(
        load_table(spark, SF_DIR, "embeddings").collect(), key=lambda r: r["vec_id"]
    )
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Mu = M / np.linalg.norm(M, axis=1, keepdims=True)

    proj: dict[int, list[float]] = {}
    for r in project_embeddings(spark, SF_DIR).collect():
        proj.setdefault(r["vec_id"], [0.0] * PROJ_OUT_DIMS)[r["out_dim"]] = r[
            "proj_val"
        ]
    P = np.array([proj[int(v)] for v in ids])

    overfetch, k = 100, 5
    recalls = []
    for q in range(10):
        sims = Mu[q] @ Mu.T
        sims[q] = -np.inf
        exact = set(ids[np.argsort(-sims)[:k]])
        d = np.linalg.norm(P - P[q], axis=1)
        d[q] = np.inf
        cand = np.argsort(d)[:overfetch]
        rer = cand[np.argsort(-(Mu[q] @ Mu[cand].T))[:k]]
        recalls.append(len(exact & set(ids[rer])) / k)
    mean = sum(recalls) / len(recalls)
    chance = overfetch / len(ids)
    assert mean >= 0.5, mean
    assert mean > 2 * chance, (mean, chance)


def test_centroid_drift_zero_for_identical_labels(spark, tmp_path):
    """Two labels with IDENTICAL vector sets both sit exactly on the
    corpus centroid → drift 0 for both; a third label shifted by +1 on
    every dimension shows drift ≈ sqrt(64 · shift²) · (its weight
    complement) > 0."""
    from bread_spark.extensions.similarity import centroid_drift_by_label

    base = [[float((i * 7 + d) % 5) / 5 for d in range(64)] for i in range(10)]
    rows = []
    vid = 0
    for lbl in (0, 1):
        for v in base:
            rows.append((vid, v, lbl))
            vid += 1
    for v in base:
        rows.append((vid, [x + 1.0 for x in v], 2))
        vid += 1
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))

    got = {
        r["label"]: r for r in centroid_drift_by_label(spark, str(tmp_path)).collect()
    }
    assert got[0]["n_vectors"] == 10
    # labels 0 and 1 share the grand centroid's unshifted component:
    # drift = |c_label - g| where g = (2/3)·c + (1/3)·(c+1) → 1/3 per dim
    import math

    expected_unshifted = math.sqrt(64 * (1.0 / 3) ** 2)
    for lbl in (0, 1):
        assert abs(got[lbl]["l2_drift"] - expected_unshifted) < 1e-3, got[lbl]
    expected_shifted = math.sqrt(64 * (2.0 / 3) ** 2)
    assert abs(got[2]["l2_drift"] - expected_shifted) < 1e-3, got[2]


def test_tiled_exact_cosine_dups_equals_broadcast_kernel(spark):
    """The distributed tiled kernel must return EXACTLY the broadcast
    kernel's pair set (same ids, same rounded scores) — it is the same
    exact computation, blocked across tile-pair groups instead of
    collected to the driver."""
    from bread_spark.extensions.similarity import (
        embedding_cosine_dups,
        embedding_cosine_dups_tiled,
    )

    want = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in embedding_cosine_dups(spark, SF_DIR).collect()
    }
    got = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in embedding_cosine_dups_tiled(spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 0


def test_tiled_exact_cosine_dups_fanout_is_exact(spark):
    """Every vector lands in exactly T tile-pair groups (one per pair
    containing its tile) — the n·T shuffle-volume contract; and no pair
    is double-emitted across groups."""
    from pyspark.sql import functions as F

    from bread_spark.extensions.similarity import (
        COSINE_TILE_T,
        embedding_cosine_dups_tiled,
    )
    from bread_spark.io import load_table

    n = load_table(spark, SF_DIR, "embeddings").count()
    pairs = embedding_cosine_dups_tiled(spark, SF_DIR)
    dup = pairs.groupBy("vec_a", "vec_b").count().filter(F.col("count") > 1)
    assert dup.count() == 0
    assert COSINE_TILE_T * (COSINE_TILE_T + 1) // 2 < n  # tiling is real


# ---------------------------------------------------------------------------
# Cluster-quality QC (silhouette family)
# ---------------------------------------------------------------------------


def _clustered_embeddings(spark, per_label=30, sep=10.0):
    """Three tightly separated clusters along distinct axes — any sane
    silhouette implementation scores them near 1.0."""
    rows = []
    for lab in range(3):
        for i in range(per_label):
            vec = [0.0] * 8
            vec[lab] = sep
            vec[(lab + 3) % 8] = (i % 7) * 0.01  # tiny within-cluster spread
            rows.append((lab * per_label + i, vec, lab))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_silhouette_separates_constructed_clusters(spark):
    from bread_spark.extensions.similarity import silhouette_scores_df

    emb = _clustered_embeddings(spark)
    rows = silhouette_scores_df(emb).collect()
    assert len(rows) == 90
    for r in rows:
        assert r["silhouette"] > 0.9, r
        # the nearest OTHER centroid is never the own label
        assert r["nearest_label"] != r["label"]


def test_silhouette_flags_planted_mislabels(spark):
    """A point carrying label 0 but sitting inside cluster 1 must get a
    NEGATIVE silhouette with nearest_label 1 — the mislabel QC claim."""
    from bread_spark.extensions.similarity import silhouette_scores_df

    emb = _clustered_embeddings(spark)
    bad = spark.createDataFrame(
        [(900, [0.0, 10.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {
        r["vec_id"]: r
        for r in silhouette_scores_df(emb.unionByName(bad)).collect()
    }
    assert rows[900]["silhouette"] < -0.9
    assert rows[900]["nearest_label"] == 1


def test_cluster_report_cells_equal_scores_rollup(spark, sf_dir):
    """The report's aggregate cells must EQUAL a recomputation from the
    scores frame (member-equality discipline, like source_dashboard)."""
    import pyspark.sql.functions as F

    from bread_spark.extensions.similarity import (
        cluster_quality_report,
        silhouette_scores,
    )

    scores = silhouette_scores(spark, sf_dir)
    want = {
        r["label"]: (r["n"], r["neg"])
        for r in scores.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("silhouette") < 0).cast("int")).alias("neg"),
        )
        .collect()
    }
    got = {
        r["label"]: (r["n_vecs"], r["n_negative"])
        for r in cluster_quality_report(spark, sf_dir).collect()
    }
    assert got == want


def test_hard_negatives_flags_planted_confusable(spark, monkeypatch):
    """Two tight clusters plus one vector planted INSIDE the wrong
    cluster: its hardest negative is closer than its nearest positive
    (margin < 0), while a clean member keeps margin > 0; every row's
    neg_label differs from its own and singleton labels surface null
    pos fields. Runs through the real catalog entry via a patched
    loader so the tile fan-out is exercised."""
    import numpy as np

    from bread_spark.extensions import similarity as S

    rng = np.random.default_rng(7)
    rows = []
    for i in range(12):  # label 0 cluster around e0
        v = np.array([10.0, 0.0, 0.0, 0.0]) + rng.normal(0, 0.1, 4)
        rows.append((i, 0, [float(x) for x in v]))
    for i in range(12, 24):  # label 1 cluster around e1
        v = np.array([0.0, 10.0, 0.0, 0.0]) + rng.normal(0, 0.1, 4)
        rows.append((i, 1, [float(x) for x in v]))
    # planted: labeled 0 but sitting in cluster 1
    rows.append((24, 0, [0.0, 10.0, 0.05, 0.0]))
    # singleton label 2
    rows.append((25, 2, [0.0, 0.0, 10.0, 0.0]))
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    monkeypatch.setattr(S, "load_table", lambda sp, sf, t: emb)
    out = {r["vec_id"]: r for r in S.hard_negatives(spark, "ignored").collect()}
    assert len(out) == 26
    for r in out.values():
        if r["neg_label"] is not None:
            assert r["neg_label"] != r["label"]
        if r["margin"] is not None:
            assert r["margin"] == round(r["pos_cos"] - r["neg_cos"], 4)
    assert out[24]["margin"] < 0  # the planted confusable
    assert out[0]["margin"] > 0  # a clean cluster member
    assert out[25]["pos_id"] is None and out[25]["margin"] is None
    assert out[25]["neg_id"] is not None


def test_hard_negatives_tile_count_invariance(spark):
    """The tile fan-out is pure parallelization: tiles=2 and tiles=8
    must produce identical rows (exactness of the blocked argmax,
    including the (cos, id) tie-break across block boundaries)."""
    from bread_spark.extensions.similarity import hard_negatives

    a = {r["vec_id"]: r for r in hard_negatives(spark, SF_DIR, tiles=2).collect()}
    b = {r["vec_id"]: r for r in hard_negatives(spark, SF_DIR, tiles=8).collect()}
    assert a == b


def test_dedup_impact_report_conserves_cluster_verdicts(spark, sf_dir):
    """The per-source rollup must re-aggregate the cluster verdicts
    exactly: kept + removed = docs per source, kept equals the
    canonical count per source, and tokens_removed is the token mass of
    exactly the non-canonical members."""
    import pyspark.sql.functions as F

    from bread_spark.extensions.dedup import dedup_clusters, dedup_impact_report
    from bread_spark.io import load_table

    clusters = {r["doc_id"]: r["is_canonical"] for r in dedup_clusters(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("n")
    ).collect()
    want = {}
    for r in docs:
        s = want.setdefault(r["source"], [0, 0, 0])
        s[0] += 1
        if clusters[r["doc_id"]]:
            s[1] += 1
        else:
            s[2] += r["n"]
    got = {r["source"]: r for r in dedup_impact_report(spark, sf_dir).collect()}
    assert set(got) == set(want)
    for src, (n_docs, n_kept, toks_rm) in want.items():
        g = got[src]
        assert (g["n_docs"], g["n_kept"], g["n_removed"]) == (
            n_docs, n_kept, n_docs - n_kept
        )
        assert g["tokens_removed"] == toks_rm
        assert g["dup_rate"] == round((n_docs - n_kept) / n_docs, 4)


def test_semantic_decontaminate_flags_planted_paraphrase(spark):
    """A corpus vector nearly parallel to a probe is flagged with that
    probe as top hit; an orthogonal vector passes clean; two identical
    probes tie on cosine and the top_probe is the LARGER id (the
    lexicographic (cosine, probe_id) rule); an empty probe set raises
    instead of silently passing everything."""
    import pytest

    from bread_spark.extensions.similarity import (
        SEM_CONTAM_THRESHOLD,
        semantic_decontam_df,
    )

    d = 8
    base = [0.0] * d
    ax0 = list(base); ax0[0] = 1.0
    ax1 = list(base); ax1[1] = 1.0
    near = list(ax0); near[1] = 0.2  # cosine vs ax0 ≈ 0.98
    probes = spark.createDataFrame(
        [(1, ax0), (2, ax0), (3, ax1)], "vec_id long, embedding array<float>"
    )
    corpus = spark.createDataFrame(
        [(100, near), (101, [0.0] * (d - 1) + [1.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in semantic_decontam_df(corpus, probes).collect()}
    flagged = out[100]
    assert flagged["contaminated"] and flagged["n_probe_hits"] == 2
    assert flagged["top_probe"] == 2  # ids 1 and 2 tie on cosine → max id
    assert flagged["top_cosine"] >= SEM_CONTAM_THRESHOLD
    clean = out[101]
    assert not clean["contaminated"] and clean["n_probe_hits"] == 0
    with pytest.raises(ValueError, match="probe set"):
        semantic_decontam_df(corpus, probes.filter("vec_id < 0"))


def test_doc_dup_saturation_planted(spark):
    """Memorization-risk profile on a planted corpus: two docs sharing
    one 3-gram each carry exactly one duplicated shingle; a doc with
    unique text carries zero. max_df reads the hottest shingle's df."""
    import pyspark.sql.functions as F

    from bread_spark.extensions.dedup import (
        DUP_SATURATION_MIN_DF,
        _word_shingles,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "a lazy dog saw the quick brown fox"),
            (3, "entirely unrelated words live here now"),
        ],
        "doc_id long, text string",
    )
    assert DUP_SATURATION_MIN_DF == 2
    sh = _word_shingles(docs)
    df_tbl = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    rows = {
        r["doc_id"]: r
        for r in sh.join(df_tbl, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("n_dup"),
            F.max("df").alias("max_df"),
        )
        .collect()
    }
    # docs 1/2 share the 3-grams "the quick brown" and "quick brown fox"
    assert rows[1]["n_shingles"] == 3 and rows[1]["n_dup"] == 2
    assert rows[2]["n_shingles"] == 6 and rows[2]["n_dup"] == 2
    assert rows[3]["n_dup"] == 0 and rows[3]["max_df"] == 1
    assert rows[1]["max_df"] == 2


def test_lsh_bucket_pairs_block_grouping_is_bucket_isolated(spark, monkeypatch):
    """Block-grouped in-bucket scoring (r12: shuffle groups are
    (table, bucket mod BUCKET_GROUP_BLOCKS) blocks to cut applyInPandas
    fixed cost) must emit the IDENTICAL pair set as strict per-bucket
    grouping — candidates still only ever meet inside a bucket, never
    across buckets that merely share a block."""
    from bread_spark.extensions import similarity

    rows = [(i, [float(((i * 7 + j * 13) % 17) - 8) for j in range(64)]) for i in range(60)]
    rows += [(200 + i, [1.0] * 64) for i in range(4)]  # one dense bucket
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def run():
        return sorted(
            (r["vec_a"], r["vec_b"], r["cosine"])
            for r in similarity.lsh_bucket_pairs_df(
                emb, threshold=0.3, max_bucket=None
            ).collect()
        )

    blocked = run()
    monkeypatch.setattr(similarity, "BUCKET_GROUP_BLOCKS", 1 << 30)  # 1 bucket/block
    strict = run()
    assert blocked == strict and blocked  # nonempty and identical


def test_simhash_md5_pairs_mih_dial_complete(spark, sf_dir):
    """The MIH dial (r13): widening max_hamming past the default 3 flips
    the probe side from exact band match (rho=0) to Hamming-ball masks
    (rho=1 at H=7, 16 masks of weight ≤1 per 15-bit band) — and the
    banded plan must still find EXACTLY the brute-force ≤H pair set
    (pigeonhole: 7 flipped bits across 4 bands leave some band ≤1).
    The default-H set is certified by the DuckDB brute-force oracle;
    this pins the widened geometry the oracle doesn't exercise.
    Collects are test-scale only (fingerprint table, bounded)."""
    from bread_spark.extensions.dedup import simhash_md5_frame, simhash_md5_pairs

    fps = {r["doc_id"]: r["simhash"] for r in simhash_md5_frame(spark, sf_dir).collect()}
    ids = sorted(fps)
    expected = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= 7
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_md5_pairs(spark, sf_dir, max_hamming=7).collect()
    }
    assert got == expected


def test_minhash_md5_recall_vs_exact_jaccard(spark):
    """The md5-lane LSH twin must clear the same recall floor as the
    xxhash64 path: every exact word-3-gram Jaccard ≥ 0.5 pair surfaces
    as a candidate (8 bands × 4 rows targets exactly this threshold).
    Correctness vs DuckDB is the oracle's job; this pins the banding
    geometry's statistical behavior on the real fixture corpus."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["ngram_jaccard_pairs"](spark, SF_DIR).collect()
    }
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["minhash_md5_candidates"](spark, SF_DIR).collect()
    }
    assert exact, "fixture corpus should contain near-duplicate pairs"
    recall = len(exact & cands) / len(exact)
    assert recall >= 0.95, f"md5-minhash-LSH recall {recall:.2f}"
