"""Similarity search over the ``embeddings`` table (array<float> column).

- brute-force cosine top-k: the exact baseline. All math is JVM-side
  (`zip_with` + `aggregate` in double precision, left-to-right summation —
  deterministic and identical to DuckDB's sequential list fold, so it
  hash-matches an oracle).
- LSH-bucketed ANN (random hyperplane signatures): the scale path. Buckets
  bound the candidate set; signature is engine-specific → rows-only check.

Scale: brute force is O(Q·N) dot products — fine when Q is small or as a
final re-rank; the hyperplane LSH turns it into O(Q·bucket) with a
broadcast of the (tiny) query set either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_table

TOP_K = 5
N_QUERIES = 10  # queries = vec_id < 10 (deterministic subset)


def _dot(a: str, b: str):
    """Double-precision dot product of two float arrays, JVM-side.

    `aggregate` folds left-to-right — same order DuckDB's list_dot_product
    uses, so cross-engine results agree to the last ulp on 64-dim vectors.
    """
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def cosine_topk(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (vec_id < N_QUERIES).

    Plan: the tiny query set rides a broadcast as a unit-normalized
    float64 matrix; each mapInPandas block scores corpus-block × queries
    with one BLAS matmul (same kernel as `embedding_cosine_dups` — the
    JVM higher-order-fold version was ~40× slower), then a per-query
    window top-k over the (small) scored set. Ordering uses the rounded
    score + vec_id tie-break so ranks are engine-deterministic.

    Scale: scoring is map-side only; the shuffle moves just
    N_QUERIES × corpus candidate rows, and WindowGroupLimit prunes to k
    per partition before the exchange (asserted in tests/test_plans.py).
    """
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    q_rows = emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding").collect()
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    q_unit = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, q_unit))

    def blocks(it):
        b_qids, b_qunit = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            a = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            a_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            a_unit = a / np.linalg.norm(a, axis=1, keepdims=True)
            scores = np.round(a_unit @ b_qunit.T, 6)  # corpus_block × queries
            ic, iq = np.nonzero(a_ids[:, None] != b_qids[None, :])
            yield pd.DataFrame(
                {"query_id": b_qids[iq], "vec_id": a_ids[ic], "cosine": scores[ic, iq]}
            )

    scored = emb.select("vec_id", "embedding").mapInPandas(
        blocks, "query_id long, vec_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid, one row per (label, dimension).

    posexplode → (label, pos) mean. At scale this is a single shuffle on
    label×64 keys; the alternative (aggregate arrays elementwise) avoids
    the explode but loses map-side partial aggregation — explode wins.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid_val"))
    )


COSINE_DUP_THRESHOLD = 0.35  # synthetic corpus: pairwise cosine tops out ~0.6


def embedding_cosine_dups(
    spark: SparkSession, sf_dir: str, threshold: float = COSINE_DUP_THRESHOLD
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b) with cosine ≥ threshold.

    Vectorized brute force: the corpus rides a Spark broadcast as one
    unit-normalized float64 matrix; each mapInPandas batch computes its
    block of the similarity matrix with a single BLAS matmul and emits only
    above-threshold pairs. No shuffle at all — scan → map → (tiny) result.

    A first cut expressed the dot products as JVM `aggregate()` folds over
    a pair join; higher-order-function lambdas are interpreted per element,
    which made the all-pairs score ~40× slower than DuckDB's vectorized
    list_dot_product. Arrow + numpy is the idiomatic fast path for dense
    math Spark's expression engine can't vectorize.

    Scale: broadcast holds to ~10M×64 float64 (~5 GB); past that,
    pre-bucket with hyperplane LSH (`lsh_bucket_topk`) so blocks only meet
    in-bucket, or tile the corpus into block-matrix chunks. Scores are
    rounded to 4 decimals — wide enough that BLAS vs sequential-fold
    summation-order differences (~1e-15) can't flip a rounding boundary,
    so the result stays engine-deterministic and oracle-checkable.
    """
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.collect()  # broadcast side; see scale note above
    ids = np.array([r["vec_id"] for r in corpus], dtype=np.int64)
    mat = np.array([r["embedding"] for r in corpus], dtype=np.float64)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, unit))

    def blocks(it):
        b_ids, b_unit = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            a = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            a_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            a_unit = a / np.linalg.norm(a, axis=1, keepdims=True)
            scores = np.round(a_unit @ b_unit.T, 4)
            ia, ib = np.nonzero((scores >= threshold) & (a_ids[:, None] < b_ids[None, :]))
            yield pd.DataFrame(
                {"vec_a": a_ids[ia], "vec_b": b_ids[ib], "cosine": scores[ia, ib]}
            )

    return emb.mapInPandas(blocks, "vec_a long, vec_b long, cosine double")


ORACLE_SQL: dict[str, str] = {
    "embedding_cosine_dups": f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               ROUND(
                 list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                 (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                  sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                 4) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE ROUND(
                 list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                 (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                  sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                 4) >= {COSINE_DUP_THRESHOLD}
    """,
    "cosine_topk": f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS q_emb
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ),
        scored AS (
            SELECT q.query_id, e.vec_id,
                   ROUND(
                     list_dot_product(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]) /
                     (sqrt(list_dot_product(q.q_emb::DOUBLE[], q.q_emb::DOUBLE[])) *
                      sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
                     6) AS cosine
            FROM embeddings e JOIN q ON e.vec_id <> q.query_id
        )
        SELECT query_id, vec_id, cosine, rank FROM (
            SELECT query_id, vec_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, vec_id ASC) AS rank
            FROM scored
        ) WHERE rank <= {TOP_K}
    """,
    "centroid_by_label": """
        SELECT label, i - 1 AS pos,
               ROUND(AVG(embedding[i]::DOUBLE), 6) AS centroid_val
        FROM embeddings, LATERAL (SELECT unnest(range(1, 65)) AS i) t
        GROUP BY label, i - 1
    """,
}


# ---------------------------------------------------------------------------
# Hyperplane-LSH ANN (scale path; rows-only check)
# ---------------------------------------------------------------------------

N_PLANES = 12


def _plane_literals(dim: int = 64, n_planes: int = N_PLANES) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (fixed LCG, no numpy dep)."""
    planes = []
    state = 42
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 33) / float(1 << 31)) - 1.0)  # [-1, 1)
        planes.append(row)
    return planes


def lsh_bucket_topk(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """ANN top-k: sign-of-projection bucket signature, candidates restricted
    to same-bucket vectors, exact cosine re-rank inside the bucket.

    Scale: the join key is the 12-bit signature (4096 buckets) — the
    all-pairs product becomes per-bucket products. Recall < 1 by design;
    rows-only correctness (signature depends on plane constants).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    planes = _plane_literals()
    plane_arr = F.array(*[F.array(*[F.lit(v) for v in row]) for row in planes])
    sig = F.expr(
        "aggregate(sequence(0, {n}), cast(0 as long), (acc, p) -> acc * 2 + "
        "  (case when aggregate(zip_with(embedding, planes_[p], (x, y) -> cast(x as double) * y), "
        "        cast(0.0 as double), (a, v) -> a + v) >= 0 then 1 else 0 end))".format(n=N_PLANES - 1)
    )
    bucketed = emb.withColumn("planes_", plane_arr).withColumn("bucket", sig).drop("planes_")
    queries = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"), F.col("bucket")
    )
    cands = bucketed.select("vec_id", "embedding", "bucket")
    pairs = cands.join(
        F.broadcast(queries),
        (cands.bucket == queries.bucket) & (F.col("vec_id") != F.col("query_id")),
    ).select("query_id", "vec_id", "q_emb", "embedding")

    # exact re-rank inside the bucket — numpy row-wise dots (the HOF fold
    # is interpreted per element; Arrow+BLAS is the dense-math fast path)
    import numpy as np
    import pandas as pd

    def score(it):
        for pdf in it:
            if not len(pdf):
                continue
            a = np.array(pdf["q_emb"].tolist(), dtype=np.float64)
            b = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            cos = np.einsum("ij,ij->i", a, b) / (
                np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
            )
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "vec_id": pdf["vec_id"],
                    "cosine": np.round(cos, 6),
                }
            )

    scored = pairs.mapInPandas(score, "query_id long, vec_id long, cosine double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )
