"""Bounded-memory frequency sketching over the ``documents`` token stream.

Count-min sketch (Cormode & Muthukrishnan 2005) as pure DataFrame
aggregates: D hash rows × WIDTH buckets of counters, built with ONE
(d, bucket)-keyed shuffle that map-side combines — the frequency table
whose size is a CONSTANT (D·WIDTH counters) regardless of corpus size.
At 100 TB this is what you keep when the exact token count table no
longer fits anywhere: point estimates cost D bucket lookups and
overestimate only (est ≥ true, union-bound error ε ≈ e/WIDTH of the
total mass per row).

The hash family is md5-derived (``int(md5(d || ':' || token)[:8 hex]) %
WIDTH``), NOT an engine hash — so unlike most sketches the ENTIRE
construction is engine-agnostic and the DuckDB oracle verifies the
sketch table and the estimates bit-for-bit (the same digest idiom the
deterministic samplers use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

CMS_D = 4  # hash rows
CMS_WIDTH = 1024  # buckets per row
CMS_TOP_K = 20  # heavy hitters audited by the calibration report


def _tokens(docs: DataFrame) -> DataFrame:
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    return docs.select(F.explode(toks).alias("token"))


def _bucket_expr(d_col: str, token_col: str) -> str:
    """SQL for h_d(token) — first 8 md5 hex chars of 'd:token' mod WIDTH."""
    return (
        f"cast(conv(substring(md5(concat(cast({d_col} as string), ':', "
        f"{token_col})), 1, 8), 16, 10) as bigint) % {CMS_WIDTH}"
    )


def cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch table itself: (d, bucket, cnt) — D·WIDTH rows max.

    Plan: explode tokens → map-side fan-out to D (d, bucket) rows per
    token (in-array transform + explode, no join) → ONE groupBy(d,
    bucket) with map-side partials. The shuffle moves D rows per token
    but combines down to ≤ D·WIDTH rows per map task — at any corpus
    size the reduce side holds a constant-size table. This is the
    staging form: persist it next to the corpus and answer frequency
    probes without the exact count table."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    rows = _tokens(docs).select(
        F.explode(
            F.expr(
                f"transform(sequence(0, {CMS_D - 1}), d -> "
                f"struct(cast(d as bigint) as d, {_bucket_expr('d', 'token')} as bucket))"
            )
        ).alias("p")
    )
    return (
        rows.select("p.d", "p.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_heavy_hitters(
    spark: SparkSession, sf_dir: str, k: int = CMS_TOP_K
) -> DataFrame:
    """Sketch-calibration report: the top-k tokens by TRUE count with
    their count-min estimates — (token, n, cms_est, overestimate). The
    audit you run at small scale before trusting the sketch at large
    scale; `overestimate` is exactly the collision mass in the token's
    least-loaded bucket (always ≥ 0 — the count-min guarantee, pinned
    for EVERY token in tests).

    Plan: true counts are one token-keyed aggregate with a distributed
    top-k (TakeOrderedAndProject); the k probes join the D·WIDTH sketch
    on (d, bucket) as a broadcast; min-over-D is a k-group aggregate."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    counts = _tokens(docs).groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(k)
    probes = top.select(
        "token",
        "n",
        F.explode(
            F.expr(
                f"transform(sequence(0, {CMS_D - 1}), d -> "
                f"struct(cast(d as bigint) as d, {_bucket_expr('d', 'token')} as bucket))"
            )
        ).alias("p"),
    ).select("token", "n", "p.d", "p.bucket")
    sketch = cms_sketch(spark, sf_dir)
    return (
        F.broadcast(probes)
        .join(sketch, ["d", "bucket"])
        .groupBy("token", "n")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "token",
            "n",
            "cms_est",
            (F.col("cms_est") - F.col("n")).alias("overestimate"),
        )
    )


_CMS_TOKENS_CTE = """
    WITH toks AS (
        SELECT unnest(list_filter(string_split(text, ' '), t -> t <> ''))
            AS token
        FROM documents
    )
"""

ORACLE_SQL: dict[str, str] = {
    "cms_sketch": f"""
        {_CMS_TOKENS_CTE},
        rows AS (
            SELECT CAST(d AS BIGINT) AS d,
                   CAST('0x' || substring(md5(CAST(d AS VARCHAR) || ':' || token), 1, 8)
                        AS BIGINT) % {CMS_WIDTH} AS bucket
            FROM toks, LATERAL (SELECT unnest(range({CMS_D})) AS d) t
        )
        SELECT d, bucket, COUNT(1) AS cnt FROM rows GROUP BY d, bucket
    """,
    "cms_heavy_hitters": f"""
        {_CMS_TOKENS_CTE},
        counts AS (SELECT token, COUNT(1) AS n FROM toks GROUP BY token),
        top AS (
            SELECT token, n FROM counts
            ORDER BY n DESC, token ASC LIMIT {CMS_TOP_K}
        ),
        rows AS (
            SELECT CAST(d AS BIGINT) AS d,
                   CAST('0x' || substring(md5(CAST(d AS VARCHAR) || ':' || token), 1, 8)
                        AS BIGINT) % {CMS_WIDTH} AS bucket
            FROM toks, LATERAL (SELECT unnest(range({CMS_D})) AS d) t
        ),
        sketch AS (SELECT d, bucket, COUNT(1) AS cnt FROM rows GROUP BY d, bucket),
        probes AS (
            SELECT p.token, p.n, CAST(d AS BIGINT) AS d,
                   CAST('0x' || substring(md5(CAST(d AS VARCHAR) || ':' || p.token), 1, 8)
                        AS BIGINT) % {CMS_WIDTH} AS bucket
            FROM top p, LATERAL (SELECT unnest(range({CMS_D})) AS d) t
        )
        SELECT p.token, p.n, MIN(s.cnt) AS cms_est,
               MIN(s.cnt) - p.n AS overestimate
        FROM probes p JOIN sketch s ON p.d = s.d AND p.bucket = s.bucket
        GROUP BY p.token, p.n
    """,
}
