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
    from bread_spark.extensions.sketch import _bucket_expr

    probes = counts.withColumn("dig", F.md5("token")).select(
        "token",
        "n",
        F.explode(
            F.expr(
                f"transform(sequence(0, {CMS_D - 1}), d -> struct("
                f"cast(d as bigint) as d, {_bucket_expr('d', 'dig')} as bucket))"
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


def test_bootstrap_ci_covers_point_and_tightens_with_mass(spark, sf_dir):
    """Sanity contract of the Poisson bootstrap: the point estimate lies
    inside (or at worst touches) every source's CI, std is non-negative,
    and a 10x-replicated source's CI is strictly TIGHTER than the base
    corpus's for the same source (more mass → less uncertainty)."""
    from bread_spark.extensions.sketch import bootstrap_source_stats
    from bread_spark.io import load_table

    rows = bootstrap_source_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["boot_std"] >= 0
        # generous slack: the CI is around the bootstrap mean, which can
        # sit a hair off the point estimate at tiny source sizes
        assert r["ci_lo"] <= r["mean_tokens"] + 2 * max(r["boot_std"], 1e-4)
        assert r["ci_hi"] >= r["mean_tokens"] - 2 * max(r["boot_std"], 1e-4)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    reps = spark.range(10).select(F.col("id").alias("rep"))
    big = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        "source",
        "text",
    )
    from bread_spark.extensions.sketch import BOOT_R, BOOT_T, _poisson_weight_sql

    # rebuild the estimator over the replicated frame (same arithmetic)
    n_tokens = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    u = (
        "cast(conv(substring(md5(concat(cast(r as string), ':', "
        "cast(doc_id as string))), 1, 8), 16, 10) as bigint)"
    )
    fan = big.select(
        "source",
        n_tokens.alias("n_tokens"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {BOOT_R - 1}), r -> struct("
                f"cast(r as bigint) as replicate, "
                f"{_poisson_weight_sql(u)} as w))"
            )
        ).alias("p"),
    ).select("source", "n_tokens", "p.replicate", "p.w")
    big_std = {
        r["source"]: r["s"]
        for r in fan.groupBy("source", "replicate")
        .agg(
            (
                F.sum(F.col("w") * F.col("n_tokens"))
                / F.nullif(F.sum("w"), F.lit(0))
            ).alias("m")
        )
        .groupBy("source")
        .agg(F.stddev_samp("m").alias("s"))
        .collect()
    }
    base_std = {r["source"]: r["boot_std"] for r in rows}
    tighter = sum(1 for s in base_std if big_std[s] < base_std[s])
    # 10x the mass → ~1/sqrt(10) the std; allow a couple of noisy sources
    assert tighter >= len(base_std) - 2, (tighter, len(base_std))


def test_hll_register_table_is_bounded(spark, sf_dir):
    """≤ M rows per source at ANY corpus size, rho within [1, VBITS+1]."""
    from bread_spark.extensions.sketch import HLL_M, HLL_VBITS, hll_registers

    regs = hll_registers(spark, sf_dir).collect()
    per_src = {}
    for r in regs:
        per_src[r["source"]] = per_src.get(r["source"], 0) + 1
        assert 0 <= r["bucket"] < HLL_M
        assert 1 <= r["max_rho"] <= HLL_VBITS + 1
    assert per_src and max(per_src.values()) <= HLL_M


def test_hll_estimate_within_error_band(spark, sf_dir):
    """Every source's estimate lands within 3 standard errors
    (3·1.04/√64 ≈ 39%) of the true distinct count — deterministic given
    the md5 hash family, so this pins the accuracy forever."""
    from bread_spark.extensions.sketch import hll_distinct_by_source

    rows = hll_distinct_by_source(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r["rel_err"]) <= 0.39, (r["source"], r["rel_err"])


def test_hll_registers_merge_by_max(spark, sf_dir):
    """THE mergeability contract: registers of the full corpus equal the
    elementwise MAX of the registers of any disjoint split — what lets a
    100 TB pipeline fold each new shard into a persisted register table
    without ever recomputing history."""
    from bread_spark.extensions.sketch import hll_registers
    from bread_spark.io import load_table

    full = {
        (r["source"], r["bucket"]): r["max_rho"]
        for r in hll_registers(spark, sf_dir).collect()
    }

    docs = load_table(spark, sf_dir, "documents").select("source", "doc_id", "text")
    from bread_spark.extensions.sketch import HLL_M, _HLL_U32, _rho_sql

    def regs_of(part):
        toks = F.filter(F.split("text", " "), lambda t: t != "")
        rows = part.select("source", F.explode(toks).alias("token")).select(
            "source",
            F.expr(f"{_HLL_U32} % {HLL_M}").alias("bucket"),
            F.expr(_rho_sql(f"({_HLL_U32} div {HLL_M})")).alias("rho"),
        )
        return {
            (r["source"], r["bucket"]): r["max_rho"]
            for r in rows.groupBy("source", "bucket")
            .agg(F.max("rho").alias("max_rho"))
            .collect()
        }

    a = regs_of(docs.filter("doc_id % 2 = 0"))
    b = regs_of(docs.filter("doc_id % 2 = 1"))
    merged = dict(a)
    for k, v in b.items():
        merged[k] = max(merged.get(k, 0), v)
    assert merged == full

    # and the DataFrame-level merge operator agrees (the op a pipeline
    # actually runs against a persisted register table)
    from bread_spark.extensions.sketch import hll_registers_df, merge_hll_registers

    via_op = {
        (r["source"], r["bucket"]): r["max_rho"]
        for r in merge_hll_registers(
            hll_registers_df(docs.filter("doc_id % 2 = 0")),
            hll_registers_df(docs.filter("doc_id % 2 = 1")),
        ).collect()
    }
    assert via_op == full


def test_hll_total_union_equals_sketch_of_union(spark, sf_dir):
    """Sketch-of-union property: max-merging the per-source registers
    gives EXACTLY the registers of a source-blind build over the whole
    corpus — and the one-row total estimate stays inside 3σ."""
    from bread_spark.extensions.sketch import (
        HLL_M,
        _HLL_U32,
        _rho_sql,
        hll_registers,
        hll_total_distinct,
    )
    from bread_spark.io import load_table

    merged = {
        r["bucket"]: r["max_rho"]
        for r in hll_registers(spark, sf_dir)
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
        .collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("text")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    direct = {
        r["bucket"]: r["max_rho"]
        for r in docs.select(F.explode(toks).alias("token"))
        .select(
            F.expr(f"{_HLL_U32} % {HLL_M}").alias("bucket"),
            F.expr(_rho_sql(f"({_HLL_U32} div {HLL_M})")).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
        .collect()
    }
    assert merged == direct

    row = hll_total_distinct(spark, sf_dir).collect()
    assert len(row) == 1
    assert abs(row[0]["rel_err"]) <= 0.39


def test_weighted_sample_by_source_exact_k_per_stratum(spark, sf_dir):
    """Exactly k docs per source, ranks dense 1..k, and each stratum's
    priorities agree with the global operator's arithmetic (shared
    expression — the two entries can never disagree)."""
    from bread_spark.functions.text import (
        WRS_PER_SOURCE_K,
        weighted_sample_by_source,
    )

    rows = weighted_sample_by_source(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["rank"])
    assert by_src
    for src, ranks in by_src.items():
        assert sorted(ranks) == list(range(1, WRS_PER_SOURCE_K + 1)), src


def test_cms_probe_report_absent_tokens_show_collision_floor(spark, sf_dir):
    """The two known-absent probes report n_true = 0 with est equal to
    pure collision mass (est == overestimate ≥ 0); the present probes
    keep the never-underestimate guarantee."""
    from bread_spark.extensions.sketch import CMS_ABSENT_PROBES, cms_probe_report

    rows = {r["token"]: r for r in cms_probe_report(spark, sf_dir).collect()}
    assert len(rows) == 5
    for t in CMS_ABSENT_PROBES:
        assert rows[t]["n_true"] == 0
        assert rows[t]["cms_est"] == rows[t]["overestimate"] >= 0
    for t, r in rows.items():
        if t not in CMS_ABSENT_PROBES:
            assert r["n_true"] > 0 and r["cms_est"] >= r["n_true"]


# ---------------------------------------------------------------------------
# HDR/DDSketch log-histogram quantile sketch
# ---------------------------------------------------------------------------


def test_hdr_bucket_bounds_contain_their_values(spark):
    """Every value's bucket must contain it: lb ≤ floor(v·100+0.5) ≤ ub —
    the invariant the quantile estimate's error bound rests on; checked
    for every event row (zero violations)."""
    from bread_spark.extensions.sketch import HDR_SCALE, _hdr_bucket_expr, hdr_sketch_df
    from bread_spark.io import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").select("value")
    sk = hdr_sketch_df(ev)
    tagged = ev.select(
        F.expr(_hdr_bucket_expr("value")).alias("bucket"),
        F.expr(f"cast(floor(value * {HDR_SCALE} + 0.5d) as bigint)").alias("iv"),
    )
    bad = (
        tagged.join(sk, "bucket")
        .filter((F.col("iv") < F.col("lb")) | (F.col("iv") > F.col("ub")))
        .count()
    )
    assert bad == 0


def test_hdr_quantile_rel_err_within_bucket_halfwidth(spark):
    """The mid-point estimate's relative error is bounded by the bucket
    half-width: |rel_err| ≤ 2^-SUB_BITS / 2 + lattice slack — pinned for
    every probed quantile."""
    from bread_spark.extensions.sketch import HDR_SUB_BITS, hdr_value_quantiles
    from tests.conftest import SF_DIR

    rows = hdr_value_quantiles(spark, SF_DIR).collect()
    assert {r["q"] for r in rows} == {0.5, 0.9, 0.99}
    bound = 2 ** (-HDR_SUB_BITS) / 2 + 0.01
    for r in rows:
        assert abs(r["rel_err"]) <= bound, (r["q"], r["rel_err"])


def test_hdr_sketch_size_is_bounded(spark):
    """The whole point: the table is O(log(max)·2^SUB_BITS) rows no
    matter the data volume — at the corpus's value range that is well
    under (octaves of 2^63) · 16 rows; pin a hard generous ceiling."""
    from bread_spark.extensions.sketch import hdr_value_sketch
    from tests.conftest import SF_DIR

    assert hdr_value_sketch(spark, SF_DIR).count() <= 63 * 16


def test_hdr_small_buckets_are_exact(spark):
    """Buckets 0..15 hold exactly one lattice point each (lb == ub), so
    small values suffer zero estimation error by construction."""
    from bread_spark.extensions.sketch import hdr_sketch_df

    frame = spark.createDataFrame(
        [(float(v) / 100.0,) for v in range(0, 16)], "value double"
    )
    for r in hdr_sketch_df(frame).collect():
        assert r["lb"] == r["ub"] == r["bucket"]


# ---------------------------------------------------------------------------
# KMV / bottom-k theta sketch
# ---------------------------------------------------------------------------


def test_kmv_sketch_bounded_sorted_distinct(spark):
    """≤ K rows per source; ranks contiguous from 1; h strictly
    increasing with rank (the sketch IS the order statistics); values
    distinct per source."""
    from bread_spark.extensions.sketch import KMV_K, kmv_sketch
    from tests.conftest import SF_DIR

    rows = kmv_sketch(spark, SF_DIR).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append((r["rk"], r["h"]))
    assert by_src
    for src, pairs in by_src.items():
        pairs.sort()
        assert len(pairs) <= KMV_K
        assert [rk for rk, _ in pairs] == list(range(1, len(pairs) + 1))
        hs = [h for _, h in pairs]
        assert hs == sorted(set(hs)), src


def test_kmv_overlap_estimator_calibrated(spark):
    """Every pair's Jaccard estimate is within a generous multiple of
    the estimator's standard error √(J(1−J)/K) of truth — the bound the
    100 TB user relies on when only sketches survive. All pairs present
    (zero-overlap pairs must surface, not vanish)."""
    from bread_spark.extensions.sketch import KMV_K, kmv_source_overlap
    from tests.conftest import SF_DIR

    rows = kmv_source_overlap(spark, SF_DIR).collect()
    n_src = len({r["source_a"] for r in rows} | {r["source_b"] for r in rows})
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        j = r["true_jaccard"]
        bound = 6 * (j * (1 - j) / KMV_K) ** 0.5 + 2.0 / KMV_K
        assert r["abs_err"] <= bound, (r["source_a"], r["source_b"], r["abs_err"])


def test_kmv_exact_when_union_fits(spark):
    """When the union's distinct shingle count is below K the sketch IS
    the set: matches equals the true intersection and the estimate
    equals true Jaccard exactly."""
    from bread_spark.extensions.sketch import KMV_K, kmv_sketch_df

    docs = spark.createDataFrame(
        [
            ("a", "w1 w2 w3 w4 w5"),
            ("a", "w2 w3 w4"),
            ("b", "w3 w4 w5 w6"),
        ],
        "source string, text string",
    )
    sk = kmv_sketch_df(docs)
    rows = sk.collect()
    # tiny vocab: every shingle retained, so the sketch is the exact set
    a = {r["h"] for r in rows if r["source"] == "a"}
    b = {r["h"] for r in rows if r["source"] == "b"}
    assert len(a | b) < KMV_K
    # doc "a w1..w5" has shingles {123,234,345}; "a w2 w3 w4" adds none
    # new beyond 234; "b" has {345,456}
    assert len(a) == 3 and len(b) == 2
    assert len(a & b) == 1  # the shared "w3 w4 w5" shingle


# ---------------------------------------------------------------------------
# Misra-Gries mergeable heavy-hitter summary
# ---------------------------------------------------------------------------


def _skewed_docs(spark, n=200):
    """One planted heavy hitter ('whale', ~35% of all tokens) over a
    long tail of per-doc-unique tokens."""
    rows = [
        (i, "whale whale whale " + " ".join(f"t{i}_{j}" for j in range(6)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_mg_summary_finds_planted_heavy_hitter(spark):
    from bread_spark.extensions.sketch import MG_K, mg_summary_df

    docs = _skewed_docs(spark)
    rows = mg_summary_df(docs).collect()
    assert 0 < len(rows) <= MG_K
    by_tok = {r["token"]: r for r in rows}
    assert "whale" in by_tok
    w = by_tok["whale"]
    true = 600  # 3 per doc × 200 docs
    assert 0 <= true - w["est_count"] <= w["max_underestimate"]


def test_mg_no_false_negatives_above_bound(spark):
    """ANY token whose true count exceeds max_underestimate must appear
    in the summary — the Misra-Gries guarantee, checked on the real
    corpus (uniform: typically nothing clears the bound, which the test
    then confirms trivially but correctly) AND the skewed one."""
    import pyspark.sql.functions as F

    from bread_spark.extensions.sketch import mg_summary_df
    from bread_spark.io import load_table
    from tests.conftest import SF_DIR

    for docs in [
        _skewed_docs(spark),
        load_table(spark, SF_DIR, "documents").select("doc_id", "text"),
    ]:
        summ = {r["token"]: r for r in mg_summary_df(docs).collect()}
        bound = max(r["max_underestimate"] for r in summ.values()) if summ else 0
        true = (
            docs.select(F.explode(F.split("text", " ")).alias("t"))
            .filter(F.col("t") != "")
            .groupBy("t")
            .count()
            .collect()
        )
        for r in true:
            if r["count"] > bound:
                assert r["t"] in summ, r
                assert (
                    r["count"] - summ[r["t"]]["est_count"]
                    <= summ[r["t"]]["max_underestimate"]
                )


def test_mg_merge_is_bounded_valid_summary(spark):
    """Folding two disjoint corpora's summaries yields estimates whose
    understatement stays within the accumulated ledger — the mergeable-
    summaries contract (error adds, size stays ≤ k); exact row equality
    with a from-scratch build is NOT claimed (the reduction is lossy)."""
    import pyspark.sql.functions as F

    from bread_spark.extensions.sketch import MG_K, merge_mg_summaries, mg_summary_df

    docs = _skewed_docs(spark, n=240)
    a = mg_summary_df(docs.filter(F.col("doc_id") < 120))
    b = mg_summary_df(docs.filter(F.col("doc_id") >= 120))
    merged = merge_mg_summaries(a, b)
    rows = merged.collect()
    assert 0 < len(rows) <= MG_K
    true = {
        r["t"]: r["count"]
        for r in docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .count()
        .collect()
    }
    for r in rows:
        under = true[r["token"]] - r["est_count"]
        assert 0 <= under <= r["max_underestimate"], r
    # the whale survives the merge
    assert any(r["token"] == "whale" for r in rows)
