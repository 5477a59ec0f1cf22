"""Spectral family: covariance vs numpy, PCA recovery of planted
structure, and the Frequent-Directions error bound."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from bread_spark.extensions.spectral import (
    FD_ELL,
    QSCALE,
    covariance_sums_df,
    fd_sketch_df,
)
from bread_spark.io import load_table
from tests.conftest import SF_DIR


def test_covariance_sums_match_numpy_exactly(spark):
    """The distributed integer moment sums must equal numpy's int64
    computation on the collected corpus — exactly, not approximately."""
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    a = np.array(
        [r["embedding"] for r in emb.collect()], dtype=np.float64
    )
    q = np.round(a * QSCALE).astype(np.int64)
    g = q.T @ q
    sx = q.sum(axis=0)
    n = len(q)
    rows = covariance_sums_df(emb).collect()
    assert len(rows) == 64 * 65 // 2
    for r in rows:
        i, j = r["i"], r["j"]
        assert r["n"] == n
        assert r["sxy"] == g[i, j]
        assert r["cov_num"] == n * g[i, j] - sx[i] * sx[j]
    # diagonal covariance numerators are non-negative (Cauchy-Schwarz)
    assert all(r["cov_num"] >= 0 for r in rows if r["i"] == r["j"])


def test_pca_recovers_planted_direction(spark, monkeypatch):
    """A corpus stretched along one known direction: component 0 must
    align with it (|cos| > 0.99), weights are orthonormal, explained
    variance is sorted and the sign convention holds."""
    from bread_spark.extensions import spectral as S

    rng = np.random.default_rng(11)
    d = 16
    direction = np.zeros(d)
    direction[3] = 1.0
    data = (
        rng.normal(0, 5.0, (400, 1)) * direction[None, :]
        + rng.normal(0, 0.3, (400, d))
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id long, embedding array<float>",
    )
    monkeypatch.setattr(S, "load_table", lambda sp, sf, t: emb)
    rows = S.pca_components(spark, "ignored", k=4).collect()
    comp = {}
    pct = {}
    for r in rows:
        comp.setdefault(r["component"], [0.0] * d)[r["pos"]] = r["weight"]
        pct[r["component"]] = r["explained_var_pct"]
    v0 = np.array(comp[0])
    assert abs(np.dot(v0, direction)) / np.linalg.norm(v0) > 0.99
    # orthonormal, sorted variance, sign convention
    for c, v in comp.items():
        v = np.array(v)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-3
        assert v[np.argmax(np.abs(v))] > 0
    for c in range(1, 4):
        assert pct[c] <= pct[c - 1]
    assert pct[0] > 90  # the planted direction dominates


def test_fd_sketch_error_bound_holds(spark):
    """The FD guarantee on the real corpus:
    ||A^T A - B^T B||_2 <= ||A||_F^2 / ell."""
    emb = load_table(spark, SF_DIR, "embeddings").select("embedding")
    a = np.array([r["embedding"] for r in emb.collect()], dtype=np.float64)
    rows = fd_sketch_df(emb).collect()
    b = np.array([r["vector"] for r in sorted(rows, key=lambda r: r["row_idx"])])
    assert len(b) <= FD_ELL
    err = np.linalg.norm(a.T @ a - b.T @ b, 2)
    bound = (a**2).sum() / FD_ELL
    assert err <= bound, (err, bound)


def test_fd_sketch_bound_invariant_to_partitioning(spark):
    """FD's merge theorem: folding per-partition sketches is still a
    valid sketch — the bound must hold whether the corpus arrives in 2
    partitions or 16 (row values may differ; the CONTRACT is the
    bound)."""
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    a = np.array(
        [r["embedding"] for r in emb.collect()], dtype=np.float64
    )
    bound = (a**2).sum() / FD_ELL
    for parts in (2, 16):
        rows = fd_sketch_df(
            emb.repartition(parts, "vec_id").select("embedding")
        ).collect()
        b = np.array(
            [r["vector"] for r in sorted(rows, key=lambda r: r["row_idx"])]
        )
        err = np.linalg.norm(a.T @ a - b.T @ b, 2)
        assert err <= bound, (parts, err, bound)


def test_fd_sketch_captures_planted_low_rank(spark):
    """Rank-2 signal + small noise: the sketch's top rows span the
    signal subspace (principal angles ~ 0)."""
    rng = np.random.default_rng(5)
    d = 32
    basis = np.linalg.qr(rng.normal(size=(d, 2)))[0].T  # 2 x d
    coef = rng.normal(0, 10.0, (600, 2))
    data = coef @ basis + rng.normal(0, 0.05, (600, d))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id long, embedding array<float>",
    )
    rows = fd_sketch_df(emb.select("embedding")).collect()
    b = np.array(
        [r["vector"] for r in sorted(rows, key=lambda r: r["row_idx"])]
    )
    top2 = np.linalg.svd(b, full_matrices=False)[2][:2]
    # principal angles between sketch top-2 and planted basis
    s = np.linalg.svd(top2 @ basis.T)[1]
    assert s.min() > 0.99


def test_fd_sketch_handles_low_dimension(spark):
    """Regression (review finding): with d < FD_ELL the shrink step
    used to return the buffer unchanged and the fold looped forever.
    The thin case now reduces exactly (rank <= d, zero Gram error) and
    must terminate with a valid, exact sketch."""
    rng = np.random.default_rng(2)
    d = 4  # < FD_ELL
    data = rng.normal(0, 1.0, (200, d))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "vec_id long, embedding array<float>",
    )
    rows = fd_sketch_df(emb.select("embedding")).collect()
    b = np.array(
        [r["vector"] for r in sorted(rows, key=lambda r: r["row_idx"])]
    )
    a = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    assert len(b) <= FD_ELL
    # rank <= d < ell: the sketch is EXACT, not just bounded
    assert np.linalg.norm(a.T @ a - b.T @ b, 2) < 1e-6 * (a**2).sum()


def test_norm_stats_hand_buckets(spark):
    """Zero vector → norm2 0 → bucket 1 (the bin(0) edge); a unit
    component → norm2 = 1e12 → bucket = len(bin(1e12)) = 40 with
    bucket_lo 2^39; mass conserves per label."""
    from bread_spark.extensions.spectral import norm_stats_df

    emb = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),
            (0, [1.0, 0.0]),
            (1, [1.0, 1.0]),
        ],
        "label int, embedding array<float>",
    )
    got = {(r["label"], r["bucket"]): r for r in norm_stats_df(emb).collect()}
    assert (0, 1) in got and got[(0, 1)]["n_vectors"] == 1  # zero vec
    assert (0, 40) in got and got[(0, 40)]["bucket_lo"] == 1 << 39
    assert (1, 41) in got  # 2e12 → 41 bits
    assert sum(r["n_vectors"] for r in got.values()) == 3


def test_norm_stats_corpus_conserves(spark, sf_dir):
    from bread_spark.extensions.spectral import embedding_norm_stats
    from bread_spark.io import load_table

    rows = embedding_norm_stats(spark, sf_dir).collect()
    assert rows
    n_vec = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vectors"] for r in rows) == n_vec
    for r in rows:
        assert r["bucket_lo"] == 1 << (r["bucket"] - 1)
