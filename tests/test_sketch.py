"""Count-min sketch: the overestimate-only guarantee must hold for EVERY
token, the sketch must stay within its constant size bound, and the plan
must be the single combiner-friendly aggregate the 100 TB story needs."""

from __future__ import annotations

from pyspark.sql import functions as F

from bread_spark.extensions.sketch import (
    CMS_D,
    CMS_WIDTH,
    cms_heavy_hitters,
    cms_sketch,
)
from bread_spark.io import load_table


def test_cms_never_underestimates_any_token(spark, sf_dir):
    """est(t) = min_d sketch[d][h_d(t)] ≥ true count for every token —
    the count-min guarantee, checked exhaustively (not just the top-k)."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    toks = docs.select(
        F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    probes = counts.select(
        "token",
        "n",
        F.explode(
            F.expr(
                f"transform(sequence(0, {CMS_D - 1}), d -> struct("
                f"cast(d as bigint) as d, "
                f"cast(conv(substring(md5(concat(cast(d as string), ':', token)), 1, 8), 16, 10) as bigint) % {CMS_WIDTH} as bucket))"
            )
        ).alias("p"),
    ).select("token", "n", "p.d", "p.bucket")
    est = (
        probes.join(cms_sketch(spark, sf_dir), ["d", "bucket"])
        .groupBy("token", "n")
        .agg(F.min("cnt").alias("est"))
    )
    bad = est.filter(F.col("est") < F.col("n")).collect()
    assert bad == [], bad


def test_cms_size_bound_and_mass_conservation(spark, sf_dir):
    """The sketch holds ≤ D·WIDTH rows no matter the corpus, and each
    hash row's counters sum to exactly the total token mass."""
    sk = cms_sketch(spark, sf_dir).collect()
    assert len(sk) <= CMS_D * CMS_WIDTH
    docs = load_table(spark, sf_dir, "documents").select("text")
    total = docs.select(
        F.sum(F.size(F.filter(F.split("text", " "), lambda t: t != "")))
    ).collect()[0][0]
    per_row: dict[int, int] = {}
    for r in sk:
        per_row[r["d"]] = per_row.get(r["d"], 0) + r["cnt"]
    assert per_row == {d: total for d in range(CMS_D)}


def test_cms_heavy_hitters_overestimate_nonnegative(spark, sf_dir):
    rows = cms_heavy_hitters(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["overestimate"] >= 0
        assert r["cms_est"] == r["n"] + r["overestimate"]
