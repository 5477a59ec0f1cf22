"""Spectral analytics over the embedding corpus: exact covariance,
PCA, and the Frequent-Directions mergeable matrix sketch.

The embedding toolkit so far reduces dimension OBLIVIOUSLY
(`project_embeddings`: a fixed Johnson-Lindenstrauss sign matrix) and
clusters with learned centroids (IVF). What it lacked is the
data-ADAPTIVE spectral layer every embedding pipeline eventually
needs: which directions actually carry the corpus's variance (PCA for
compaction, whitening, drift diagnosis), and a way to maintain that
answer incrementally at 100 TB (a mergeable sketch of A^T A).

- `embedding_covariance` — the d x d second-moment table in EXACT
  integer arithmetic: values micro-quantize JVM-side (SQL `round`, so
  both engines share half-away-from-zero — numpy's half-even never
  touches the data), each Arrow block contributes one integer outer
  product Q^T Q (int64 matmul, exact — commutative sums, so partition
  order is irrelevant), and the per-(i, j) partials fold in one keyed
  aggregate. Output carries the raw sums (n, sxy, sx, sy) plus the
  exact covariance NUMERATOR ``cov_num = n*sxy - sx*sy`` — all
  bigints, so the whole matrix is hash-checked against DuckDB's
  unnest/self-join mirror. Shuffle volume is O(partitions * d^2),
  never O(n * d^2): the quadratic-in-d work rides map-side.
  Overflow: |q| <= ~1e6 keeps n*sxy under 2^62 for n up to ~1e6 docs;
  beyond that the partials cast to DECIMAL(38,0) — same plan shape
  (noted, not needed at test scale).

- `pca_components` — eigendecomposition of the d x d covariance on
  the DRIVER (the one place O(d^2) -> O(d^3) work belongs; d = 64 is
  a compile-time-bounded collect, the `bpe_merges` convention), top-k
  eigenvectors emitted as (component, pos, weight, explained_var_pct)
  rows. Rows-only: eigenvectors are float and sign-ambiguous across
  LAPACK builds — properties (orthonormality, variance ordering,
  agreement of explained variance with the exact integer trace) are
  pinned in tests instead. Sign convention: each component's
  largest-|weight| position is made positive, so output is
  deterministic for a fixed corpus.

- `fd_sketch` — Frequent Directions (Liberty 2013; Ghashami et al.
  2015): the ell x d matrix B whose Gram matrix B^T B approximates
  A^T A within ||A||_F^2 / ell in spectral norm — the MATRIX member
  of the mergeable-sketch algebra (CMS: counts, HLL: distinct, KMV:
  sets, HDR: quantiles, MG: heavy hitters, FD: covariance/subspace).
  Each partition folds its rows through the shrink step
  (SVD -> subtract sigma_ell^2 -> re-scale) in `mapInPandas`; the
  bounded per-partition sketches (P * ell rows) fold on the driver
  with the SAME shrink — FD's merge theorem makes the result a valid
  sketch of the whole corpus. Rows-only (SVD floats are build-
  dependent); the ERROR BOUND — not the row values — is the contract,
  pinned in tests on planted low-rank + noise corpora, along with the
  shard-merge bound.

Reference parity: the reference has no spectral/matrix analytics;
additive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

QSCALE = 1_000_000
PCA_K = 8  # components reported
FD_ELL = 16  # sketch rows


def _quantized(emb: DataFrame) -> DataFrame:
    """(vec_id, q) with q = array<long> micro-quantized JVM-side —
    SQL round (half away from zero) on both engines; numpy never
    rounds anything."""
    return emb.select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> "
            f"cast(round(cast(x as double) * {QSCALE}) as bigint))"
        ).alias("q"),
    )


def covariance_sums_df(emb: DataFrame) -> DataFrame:
    """Exact integer moment sums per dimension pair (i <= j):
    (i, j, n, sxy, sx, sy, cov_num)."""
    import numpy as np
    import pandas as pd

    def partials(it):
        for pdf in it:
            if not len(pdf):
                continue
            q = np.array(pdf["q"].tolist(), dtype=np.int64)
            d = q.shape[1]
            g = q.T @ q  # exact int64 outer-product sum
            sx = q.sum(axis=0)
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": np.concatenate([iu, np.arange(d)]),
                    "j": np.concatenate([ju, np.full(d, -1)]),
                    "v": np.concatenate([g[iu, ju], sx]),
                    "n": np.concatenate(
                        [np.zeros(len(iu), dtype=np.int64),
                         np.full(d, len(q), dtype=np.int64)]
                    ),
                }
            )

    parts = _quantized(emb).mapInPandas(
        partials, "i int, j int, v long, n long"
    )
    agg = parts.groupBy("i", "j").agg(
        F.sum("v").alias("v"), F.sum("n").alias("n")
    )
    sums = agg.filter(F.col("j") >= 0).select("i", "j", F.col("v").alias("sxy"))
    dims = agg.filter(F.col("j") == -1).select(
        F.col("i").alias("dim"), F.col("v").alias("sx"), "n"
    )
    di = dims.select(
        F.col("dim").alias("i"), F.col("sx").alias("sx"), "n"
    )
    dj = dims.select(F.col("dim").alias("j"), F.col("sx").alias("sy"))
    return (
        sums.join(F.broadcast(di), "i")
        .join(F.broadcast(dj), "j")
        .select(
            "i",
            "j",
            "n",
            "sxy",
            "sx",
            "sy",
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
                "cov_num"
            ),
        )
    )


def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact d x d covariance moment table (module docstring):
    (i, j, n, sxy, sx, sy, cov_num) for i <= j, all exact bigints;
    cov(i, j) = cov_num / (n^2) in micro^2 units when a float is
    finally wanted — but nothing here ever becomes one."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    return covariance_sums_df(emb)


def _cov_matrix(spark: SparkSession, sf_dir: str):
    """Driver-side dense covariance (float, for eigen work) from the
    exact integer sums — the bounded O(d^2) collect."""
    import numpy as np

    rows = embedding_covariance(spark, sf_dir).collect()
    d = max(r["j"] for r in rows) + 1
    n = rows[0]["n"]
    c = np.zeros((d, d))
    for r in rows:
        v = r["cov_num"] / (n * n)
        c[r["i"], r["j"]] = v
        c[r["j"], r["i"]] = v
    return c, n


def pca_components(
    spark: SparkSession, sf_dir: str, k: int = PCA_K
) -> DataFrame:
    """Top-k principal components of the embedding corpus (module
    docstring): (component, pos, weight, explained_var_pct) — rows-only
    (LAPACK floats; sign fixed by making each component's largest-|w|
    position positive)."""
    import numpy as np

    c, _ = _cov_matrix(spark, sf_dir)
    vals, vecs = np.linalg.eigh(c)
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    total = vals.sum()
    rows = []
    for comp in range(k):
        v = vecs[:, comp]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        pct = round(float(100.0 * vals[comp] / total), 4)
        for pos in range(len(v)):
            rows.append((comp, pos, round(float(v[pos]), 6), pct))
    return spark.createDataFrame(
        rows, "component int, pos int, weight double, explained_var_pct double"
    )


FD_MERGE_FANOUT = 32  # tree-fold width: level-1 groups, level-2 roots


def _fd_shrink(mat, ell_):
    """SVD -> soft-shrink by sigma_ell^2 -> keep ell live rows.
    Fewer singular values than ell (d < ell, or a thin buffer):
    rank <= len(s), so s*vt IS the matrix with ZERO Gram error in
    <= len(s) rows — returning `mat` unchanged here would leave
    the fold loop unable to ever reduce the buffer (infinite
    loop when d < FD_ELL; review finding, regression-tested)."""
    import numpy as np

    u, s, vt = np.linalg.svd(mat, full_matrices=False)
    if len(s) < ell_:
        return s[:, None] * vt
    delta = s[ell_ - 1] ** 2
    s2 = np.sqrt(np.maximum(s**2 - delta, 0.0))
    return (s2[:, None] * vt)[:ell_]


def _fd_fold(matrices, ell):
    """Vstack-and-shrink fold of an iterable of sketch blocks — the FD
    merge operator (associative up to the shared error bound), applied
    identically at every tree level."""
    import numpy as np

    buf = None
    for m in matrices:
        block = np.asarray(m, dtype=np.float64)
        if block.size == 0:
            continue
        buf = block if buf is None else np.vstack([buf, block])
        while len(buf) >= 2 * ell:
            buf = _fd_shrink(buf, ell)
    if buf is not None and len(buf) > ell:
        buf = _fd_shrink(buf, ell)
    return buf


def fd_sketch_df(
    emb: DataFrame, ell: int = FD_ELL, fanout: int = FD_MERGE_FANOUT
) -> DataFrame:
    """Frequent-Directions sketch of the (quantize-free, raw double)
    embedding matrix: `ell` rows (row_idx, vector) such that
    ||A^T A - B^T B||_2 <= ||A||_F^2 / ell. Returns the sketch plus
    each row's singular value as `sv` for downstream subspace use.

    Fully distributed tree-fold (r9 — the merge used to be a
    sequential O(partitions) driver vstack loop): each partition folds
    its rows through the shrink step in `mapInPandas`, the bounded
    per-partition sketches (ell x d each) key by ``pmod(partition_id,
    fanout)`` and shrink-merge per group in an `applyInPandas` stage,
    and the <= fanout group sketches merge in ONE final task that also
    canonicalizes (final SVD, 6-decimal rounding). FD's merge theorem
    makes every tree shape a valid sketch of the whole corpus, so two
    levels suffice at any real partition count (10^5 partitions ->
    level-1 tasks fold ~3e3 ell x d blocks each, executor-side). No
    driver-side compute at all; nothing is ever collected."""
    import pandas as pd

    def part_sketch(it):
        import numpy as np

        buf = None
        for pdf in it:
            if not len(pdf):
                continue
            a = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            buf = a if buf is None else np.vstack([buf, a])
            while len(buf) >= 2 * ell:
                buf = _fd_shrink(buf, ell)
        if buf is None:
            return
        if len(buf) > ell:
            buf = _fd_shrink(buf, ell)
        yield pd.DataFrame({"rows": [buf.tolist()]})

    def merge_group(pdf):
        buf = _fd_fold(
            (list(m) for m in pdf["rows"]), ell
        )
        if buf is None:
            return pd.DataFrame({"rows": []})
        return pd.DataFrame({"rows": [buf.tolist()]})

    def finalize_group(pdf):
        import numpy as np

        buf = _fd_fold((list(m) for m in pdf["rows"]), ell)
        if buf is None:
            return pd.DataFrame(
                {"row_idx": [], "sv": [], "vector": []}
            )
        u, s, vt = np.linalg.svd(buf, full_matrices=False)
        b = s[:, None] * vt
        k = min(ell, len(b))
        return pd.DataFrame(
            {
                "row_idx": range(k),
                "sv": [round(float(s[i]), 6) for i in range(k)],
                "vector": [
                    [round(float(x), 6) for x in b[i]] for i in range(k)
                ],
            }
        )

    parts = emb.select("embedding").mapInPandas(
        part_sketch, "rows array<array<double>>"
    )
    level1 = (
        parts.withColumn("g", F.pmod(F.spark_partition_id(), F.lit(fanout)))
        .groupBy("g")
        .applyInPandas(merge_group, "rows array<array<double>>")
    )
    return (
        level1.withColumn("g", F.lit(0))
        .groupBy("g")
        .applyInPandas(
            finalize_group, "row_idx int, sv double, vector array<double>"
        )
    )


def fd_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-Directions sketch of the embedding corpus (module
    docstring): FD_ELL rows whose Gram matrix approximates A^T A
    within ||A||_F^2 / FD_ELL."""
    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    return fd_sketch_df(emb)


def norm_stats_df(emb: DataFrame) -> DataFrame:
    """`embedding_norm_stats` core: (label, bucket, bucket_lo,
    n_vectors) — squared-norm distribution per label in doubling
    buckets.

    The embedding-QC gate before any cosine/centroid work: zero or
    near-zero vectors poison cosine (undefined direction), and a
    label whose norm distribution sits in different buckets than the
    rest signals a scale-drifted embedding batch. norm2 is the EXACT
    bigint Σ q_i² of the micro-quantized components, computed with a
    JVM-side `aggregate` lambda over the array — no explode, no
    shuffle until the ≤(labels × ~50)-row aggregate; bucket =
    LENGTH(bin(norm2)), the engine-exact binary-string trick (norm2=0
    lands in bucket 1 with [1,2), the documented `bin(0)` edge).
    Per-component q ≤ ~2e6 → q² ≤ 4e12, ×64 dims ≤ 2.6e14 — far
    inside int64 at any embedding scale that fits a float."""
    norm2 = F.expr(
        f"aggregate(embedding, cast(0 as bigint), (acc, x) -> "
        f"acc + cast(round(cast(x as double) * {QSCALE}) as bigint)"
        f" * cast(round(cast(x as double) * {QSCALE}) as bigint))"
    )
    bucket = F.length(F.bin(F.col("norm2"))).cast("long")
    return (
        emb.select("label", norm2.alias("norm2"))
        .select("label", bucket.alias("bucket"))
        .groupBy("label", "bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .select(
            "label",
            "bucket",
            F.expr(
                "shiftleft(cast(1 as bigint), cast(bucket - 1 as int))"
            ).alias("bucket_lo"),
            "n_vectors",
        )
    )


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label squared-norm doubling histogram (docstring of
    `norm_stats_df`)."""
    emb = load_table(spark, sf_dir, "embeddings").select("label", "embedding")
    return norm_stats_df(emb)


ORACLE_SQL: dict[str, str] = {
    "embedding_norm_stats": f"""
    WITH n2 AS (
        SELECT label,
               CAST(list_sum(list_transform(embedding, x ->
                    CAST(ROUND(CAST(x AS DOUBLE) * {QSCALE}) AS BIGINT)
                    * CAST(ROUND(CAST(x AS DOUBLE) * {QSCALE}) AS BIGINT)))
                    AS BIGINT) AS norm2
        FROM embeddings
    )
    SELECT label,
           CAST(LENGTH(bin(norm2)) AS BIGINT) AS bucket,
           CAST(CAST(1 AS BIGINT)
                << (CAST(LENGTH(bin(norm2)) AS INTEGER) - 1) AS BIGINT)
               AS bucket_lo,
           COUNT(1) AS n_vectors
    FROM n2 GROUP BY label, LENGTH(bin(norm2))
""",
    "embedding_covariance": f"""
    WITH flat AS (
        SELECT e.vec_id, d.i,
               CAST(ROUND(CAST(e.embedding[d.i + 1] AS DOUBLE) * {QSCALE})
                    AS BIGINT) AS q
        FROM embeddings e, LATERAL (
            SELECT unnest(range(len(e.embedding))) AS i
        ) d
    ),
    sums AS (
        SELECT a.i, b.i AS j,
               CAST(SUM(a.q * b.q) AS BIGINT) AS sxy
        FROM flat a JOIN flat b
          ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY 1, 2
    ),
    dims AS (
        SELECT i, CAST(SUM(q) AS BIGINT) AS sx,
               CAST(COUNT(1) AS BIGINT) AS n
        FROM flat GROUP BY 1
    )
    SELECT s.i, s.j, di.n, s.sxy, di.sx, dj.sx AS sy,
           CAST(di.n * s.sxy - di.sx * dj.sx AS BIGINT) AS cov_num
    FROM sums s
    JOIN dims di ON di.i = s.i
    JOIN dims dj ON dj.i = s.j
""",
}
