"""Graph analytics over the content-provenance graph: deterministic
integer PageRank.

The corpus induces a natural directed graph: whenever two documents
share a word shingle, content flowed (by the keep-earliest convention
every dedup family here uses) from the EARLIEST document that has it.
`doc_provenance_edges` materializes that graph — one edge per
(copier, canonical) pair, weighted by the number of shared shingles —
and `doc_authority_rank` runs PageRank over it, giving each document a
provenance-authority score: documents whose content is widely copied
rank high, pure copiers sink to the base rank. In a curation pipeline
this is the upweight-originals / downweight-mirrors signal that
pairwise dedup alone cannot produce (dedup says "these two match";
rank says "this one is the source everyone else copies").

Complements the existing graph operator (`connected_components` /
`dedup_clusters`, which finds undirected equivalence classes) with a
DIRECTED, weighted, global-importance computation — the classic
power-iteration workload.

**Exact-integer PageRank.** Classic PageRank is float-summed and
therefore summation-order-sensitive — unusable under the repo's
cross-engine hash gate. This implementation runs ENTIRELY in 64-bit
integer micro-units and is bit-for-bit reproducible on any engine:

- every node starts at ``R0 = 1_000_000`` micro-units;
- per iteration, a node keeps ``R0 - DAMP`` (the teleport base) and
  ships ``share = rank * DAMP_NUM // DAMP_DEN`` (integer division) to
  its out-neighbors, split as ``share * w // W`` per edge (W = the
  node's total out-weight, again integer division);
- ``new_rank = BASE + sum(incoming)`` — a plain bigint sum.

Both engines TRUNCATE toward zero (Spark ``div``, DuckDB ``//`` —
neither floors for negative operands, but every operand here is a
non-negative rank/weight, where truncation and floor coincide).
Integer division leaks a deterministic few micro-units per split instead
of renormalizing — the price of exactness, identical on both engines.
Dangling mass (nodes with no out-edges keep only BASE; their share
vanishes) uses the standard "leaked" PageRank variant, documented
rather than redistributed, which keeps every iteration one join + one
aggregate. `PR_ITERS` fixed power iterations rather than
convergence-testing: deterministic plan depth, and rank ORDER
stabilizes long before values do.

Bounds under ANSI mode: total mass never exceeds n * R0; a universal
sink's rank is < n * R0, so ``rank * DAMP_NUM`` stays < 2^62 for any
corpus below ~5e13 docs — no overflow at any plausible scale.

Scale shape: the edge build rides the SHARED capped-shingle seam
(`capped_shingle_frame` — already materialized by the jaccard family;
df <= MAX_DF bounds per-shingle edge fan-out), and each iteration is
one keyed join (ranks x edges on src) + one keyed aggregate (sum by
dst) + one left join back onto the node set — the standard
Pregel-on-DataFrames shape, no collect, no broadcast of anything
unbounded. Iteration count is a compile-time constant, so the whole
rank is ONE Catalyst plan of fixed depth.

Streaming: batch-only by design — PageRank is a fixed-point over the
WHOLE graph; there is no per-arrival incremental form with the same
semantics. The incremental path is the edge table (new crawl shards
append edges via the same seam; re-rank on a schedule), which is how
production link-analysis pipelines run it.

Reference parity: the reference has no graph analytics; additive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..plans.materialize import materialized_frame
from .dedup import MAX_DF, SHINGLE_N, capped_shingle_frame

R0 = 1_000_000  # initial rank in micro-units
DAMP_NUM, DAMP_DEN = 85, 100  # damping factor 0.85 as an exact ratio
BASE = R0 - R0 * DAMP_NUM // DAMP_DEN  # teleport base kept each iteration
PR_ITERS = 5  # fixed power iterations


def provenance_edges_df(shingles: DataFrame) -> DataFrame:
    """(src, dst, w) from a (doc_id, shingle) posting index: for every
    shingle, its earliest (min doc_id) holder is the canonical; every
    later holder gets one edge toward it, weights summed per pair.
    Only equality and MIN over doc_id touch the shingle column, so the
    identity-hashed (xxhash64) seam index is safe here — no ordering
    of shingle values anywhere."""
    canon = shingles.groupBy("shingle").agg(F.min("doc_id").alias("dst"))
    return (
        shingles.join(canon, "shingle")
        .filter(F.col("doc_id") > F.col("dst"))
        .groupBy(F.col("doc_id").alias("src"), "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def edge_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compute-once provenance edge table — shared by the edge entry
    and the rank entry (and, at 100 TB, the staging table a scheduled
    re-rank reads)."""
    return materialized_frame(
        spark,
        "provenance_edges",
        sf_dir,
        lambda: provenance_edges_df(
            capped_shingle_frame(spark, sf_dir, MAX_DF)
        ),
        (SHINGLE_N, MAX_DF),
    )


def doc_provenance_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The content-provenance graph: (src, dst, w) — src shares `w`
    capped shingles whose earliest holder is dst (module docstring)."""
    return edge_frame(spark, sf_dir)


def authority_rank_df(
    docs: DataFrame, edges: DataFrame, iters: int = PR_ITERS
) -> DataFrame:
    """`doc_authority_rank` core: integer PageRank over (src, dst, w)
    for every doc in `docs` (doc_id column). Returns (doc_id,
    rank_micro, n_out, n_in) with rank_micro exact."""
    nodes = docs.select("doc_id")
    outw = edges.groupBy("src").agg(
        F.sum("w").alias("tot_w"), F.count(F.lit(1)).alias("n_out")
    )
    n_in = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("n_in"))

    ranks = nodes.select("doc_id", F.lit(R0).cast("long").alias("rank"))
    for _ in range(iters):
        contrib = (
            ranks.join(edges, ranks["doc_id"] == edges["src"])
            .join(outw, "src")
            # share = rank*85 div 100, then split share*w div W — two
            # explicit INTEGER divisions (SQL `div`, never `/`: float
            # division + cast could mis-round near-integer quotients),
            # mirrored by the oracle's `//` (both truncate toward zero;
            # operands are non-negative so that equals floor)
            .select(
                "dst",
                F.expr(
                    f"(((rank * {DAMP_NUM}) div {DAMP_DEN}) * w) div tot_w"
                ).alias("c"),
            )
        )
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("inc"))
        ranks = (
            nodes.join(
                incoming, nodes["doc_id"] == incoming["dst"], "left"
            )
            .select(
                "doc_id",
                (F.lit(BASE) + F.coalesce("inc", F.lit(0)))
                .cast("long")
                .alias("rank"),
            )
        )
    return (
        ranks.join(outw, ranks["doc_id"] == outw["src"], "left")
        .join(n_in, ranks["doc_id"] == n_in["dst"], "left")
        .select(
            "doc_id",
            F.col("rank").alias("rank_micro"),
            F.coalesce("n_out", F.lit(0)).alias("n_out"),
            F.coalesce("n_in", F.lit(0)).alias("n_in"),
        )
    )


def doc_authority_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance-authority PageRank over the corpus (module docstring):
    (doc_id, rank_micro, n_out, n_in), rank in exact integer
    micro-units after `PR_ITERS` power iterations."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return authority_rank_df(docs, edge_frame(spark, sf_dir))


# ---------------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------------

_EDGES_CTE = f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    sh0 AS (
        SELECT DISTINCT doc_id,
               words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
        FROM w, LATERAL (SELECT unnest(range(1, len(words) - 1)) AS i) t
        WHERE len(words) >= {SHINGLE_N}
    ),
    hot AS (
        SELECT shingle FROM sh0 GROUP BY shingle
        HAVING COUNT(1) > {MAX_DF}
    ),
    sh AS (
        SELECT sh0.doc_id, sh0.shingle FROM sh0
        WHERE sh0.shingle NOT IN (SELECT shingle FROM hot)
    ),
    canon AS (
        SELECT shingle, MIN(doc_id) AS dst FROM sh GROUP BY shingle
    ),
    edges AS (
        SELECT s.doc_id AS src, c.dst, CAST(COUNT(1) AS BIGINT) AS w
        FROM sh s JOIN canon c USING (shingle)
        WHERE s.doc_id > c.dst
        GROUP BY 1, 2
    )
"""


def _rank_iteration_sql(prev: str, out: str) -> str:
    """One integer power iteration as SQL CTE text. DuckDB ``//`` on
    BIGINT operands truncates toward zero — same as Spark's ``div``
    (equal to floor here because ranks/weights are non-negative)."""
    return f"""
    {out} AS (
        SELECT n.doc_id,
               CAST({BASE} + COALESCE(i.inc, 0) AS BIGINT) AS rank
        FROM nodes n LEFT JOIN (
            SELECT e.dst AS doc_id,
                   SUM((r.rank * {DAMP_NUM} // {DAMP_DEN}) * e.w // o.W)
                       AS inc
            FROM {prev} r
            JOIN edges e ON e.src = r.doc_id
            JOIN outw o ON o.src = e.src
            GROUP BY 1
        ) i USING (doc_id)
    )"""


def _rank_sql() -> str:
    parts = [
        _EDGES_CTE,
        """,
    nodes AS (SELECT doc_id FROM documents),
    outw AS (
        SELECT src, SUM(w) AS W, COUNT(1) AS n_out FROM edges GROUP BY 1
    ),
    nin AS (SELECT dst, COUNT(1) AS n_in FROM edges GROUP BY 1),"""
        + f"""
    it0 AS (SELECT doc_id, CAST({R0} AS BIGINT) AS rank FROM nodes),""",
    ]
    for i in range(PR_ITERS):
        parts.append(_rank_iteration_sql(f"it{i}", f"it{i + 1}") + ",")
    # strip the trailing comma from the last CTE
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"""
    SELECT r.doc_id, r.rank AS rank_micro,
           CAST(COALESCE(o.n_out, 0) AS BIGINT) AS n_out,
           CAST(COALESCE(i.n_in, 0) AS BIGINT) AS n_in
    FROM it{PR_ITERS} r
    LEFT JOIN outw o ON o.src = r.doc_id
    LEFT JOIN nin i ON i.dst = r.doc_id
"""
    )
    return "".join(parts)


# ---------------------------------------------------------------------------
# Label propagation
# ---------------------------------------------------------------------------

LP_ITERS = 2  # fixed propagation rounds (plan depth is compile-time)
SEED_MOD, SEED_KEEP = 5, 2  # doc_id % 5 < 2 → ~40% labeled seeds


def _sym_edges(edges: DataFrame) -> DataFrame:
    """Undirected view of the provenance graph: each (src, dst, w) edge
    contributes both (node, nbr) directions. The edge build emits only
    src > dst pairs, so the union cannot create duplicate rows."""
    return edges.select(
        F.col("src").alias("node"), F.col("dst").alias("nbr"), "w"
    ).unionByName(
        edges.select(
            F.col("dst").alias("node"), F.col("src").alias("nbr"), "w"
        )
    )


def label_propagation_df(
    docs: DataFrame, edges: DataFrame, iters: int = LP_ITERS
) -> DataFrame:
    """`doc_label_propagation` core over (doc_id, lang) nodes and
    (src, dst, w) edges. Semi-supervised label spread: docs with
    ``doc_id % SEED_MOD < SEED_KEEP`` (and a non-null lang) are CLAMPED
    seeds; every other doc adopts, per round, the weighted-majority
    label of its already-labeled neighbors over the undirected graph.

    The argmax is the repo's lexicographic-MAX convention in its
    engine-agnostic string form (models.py's lpad lane): candidate =
    MAX(lpad(w_sum, 18, '0') || label), then strip the 18-char weight
    prefix — ties on weight resolve to the lexicographically LARGEST
    label, identically in Spark and DuckDB. A node with no labeled
    neighbor keeps its previous label (NULL stays NULL), so labels only
    ever spread outward from seeds; a clamped seed never changes.

    Scale shape: each round is one keyed join (labels x undirected
    edges on the neighbor id) + a (node, label) weight sum + a per-node
    MAX — all doc_id-keyed shuffles, no collect, no broadcast of
    anything unbounded; `iters` is a compile-time constant so the whole
    spread is ONE Catalyst plan of fixed depth, exactly the PageRank
    discipline above.

    Streaming: batch-only by design, the PageRank rationale — the
    spread is a fixed-point over the WHOLE graph with no per-arrival
    incremental form; the incremental path is the shared edge seam.
    """
    seed_cond = (F.col("doc_id") % SEED_MOD < SEED_KEEP) & F.col(
        "lang"
    ).isNotNull()
    nodes = docs.select(
        "doc_id",
        F.when(seed_cond, F.col("lang")).alias("seed_label"),
    )
    sym = _sym_edges(edges)
    labels = nodes.select("doc_id", F.col("seed_label").alias("label"))
    for _ in range(iters):
        votes = (
            sym.join(
                labels.filter(F.col("label").isNotNull()).select(
                    F.col("doc_id").alias("nbr"), "label"
                ),
                "nbr",
            )
            .groupBy("node", "label")
            .agg(F.sum("w").alias("w_sum"))
        )
        cand = (
            votes.groupBy("node")
            .agg(
                F.max(
                    F.concat(
                        F.lpad(F.col("w_sum").cast("string"), 18, "0"),
                        F.col("label"),
                    )
                ).alias("lane")
            )
            .select(
                F.col("node").alias("doc_id"),
                F.substring("lane", 19, 1_000_000).alias("cand"),
            )
        )
        labels = (
            nodes.join(labels, "doc_id")
            .join(cand, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("seed_label", "cand", "label").alias("label"),
            )
        )
    return (
        nodes.join(labels, "doc_id")
        .select(
            "doc_id",
            "label",
            F.when(F.col("seed_label").isNotNull(), F.lit("seed"))
            .when(F.col("label").isNotNull(), F.lit("propagated"))
            .otherwise(F.lit("unlabeled"))
            .alias("origin"),
        )
    )


def doc_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised language-label spread over the provenance graph
    (docstring of `label_propagation_df`): (doc_id, label, origin)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return label_propagation_df(docs, edge_frame(spark, sf_dir))


def _lp_iteration_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
        SELECT n.doc_id,
               COALESCE(n.seed_label, c.cand, p.label) AS label
        FROM lp_nodes n
        JOIN {prev} p USING (doc_id)
        LEFT JOIN (
            SELECT node AS doc_id,
                   substring(MAX(lpad(CAST(w_sum AS VARCHAR), 18, '0')
                                 || label), 19) AS cand
            FROM (
                SELECT s.node, p2.label, SUM(s.w) AS w_sum
                FROM sym s
                JOIN {prev} p2 ON s.nbr = p2.doc_id
                WHERE p2.label IS NOT NULL
                GROUP BY s.node, p2.label
            )
            GROUP BY node
        ) c USING (doc_id)
    )"""


def _lp_sql() -> str:
    parts = [
        _EDGES_CTE,
        f""",
    sym AS (
        SELECT src AS node, dst AS nbr, w FROM edges
        UNION ALL
        SELECT dst AS node, src AS nbr, w FROM edges
    ),
    lp_nodes AS (
        SELECT doc_id,
               CASE WHEN doc_id % {SEED_MOD} < {SEED_KEEP}
                         AND lang IS NOT NULL
                    THEN lang END AS seed_label
        FROM documents
    ),
    lp0 AS (SELECT doc_id, seed_label AS label FROM lp_nodes),""",
    ]
    for i in range(LP_ITERS):
        parts.append(_lp_iteration_sql(f"lp{i}", f"lp{i + 1}") + ",")
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"""
    SELECT n.doc_id, r.label,
           CASE WHEN n.seed_label IS NOT NULL THEN 'seed'
                WHEN r.label IS NOT NULL THEN 'propagated'
                ELSE 'unlabeled' END AS origin
    FROM lp_nodes n JOIN lp{LP_ITERS} r USING (doc_id)
"""
    )
    return "".join(parts)


# ---------------------------------------------------------------------------
# Content novelty
# ---------------------------------------------------------------------------


def novelty_scores_df(shingles: DataFrame) -> DataFrame:
    """`doc_novelty_scores` core over the (doc_id, shingle) posting
    index: per doc, how many of its capped shingles are FIRST-SEEN here
    (this doc is the min-doc_id holder — the same keep-earliest
    convention the edge build uses) vs inherited from an earlier doc.

    The per-doc complement of `doc_authority_rank`: rank measures how
    much OTHERS copy you (global fixed point over the edges); novelty
    measures how much of YOU is original (one local ratio per doc) —
    the crawl-prioritization signal for incremental ingest, where a
    new shard's low-novelty docs are dropped before any pairwise
    dedup runs. novelty_micro = (n_novel · 1e6) div n_shingles, the
    exact integer micro-ratio. Docs with zero capped shingles (shorter
    than the shingle width, or all-stopword content) have no defined
    ratio and are absent from the output, stated rather than NULLed.

    Scale shape: one groupBy(shingle) MIN (already computed for the
    edge build — same first-holder table), one shingle-keyed join back
    onto the postings, one groupBy(doc_id). No collect, nothing
    broadcast.

    Streaming: batch-only by design, the graph family's rationale —
    the first-holder table is a MIN over the WHOLE corpus, so a doc's
    novelty is only final once every earlier doc_id has been seen.
    The incremental path is the appendable shingle seam: an
    append-only ingest (doc_ids increasing) can gate each new shard
    against the EXISTING first-holder table — exactly the
    cross-corpus-gate pattern `cross_dedup_spans` certifies — and
    re-score on the schedule the edge table already re-ranks on."""
    canon = shingles.groupBy("shingle").agg(
        F.min("doc_id").alias("first_holder")
    )
    return (
        shingles.join(canon, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("doc_id") == F.col("first_holder"), 1).otherwise(
                    0
                )
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.expr("(n_novel * 1000000) div n_shingles").alias(
                "novelty_micro"
            ),
        )
    )


def doc_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc first-seen content ratio over the shared capped-shingle
    seam (docstring of `novelty_scores_df`): (doc_id, n_shingles,
    n_novel, novelty_micro)."""
    return novelty_scores_df(capped_shingle_frame(spark, sf_dir, MAX_DF))


# ---------------------------------------------------------------------------
# Triangle census
# ---------------------------------------------------------------------------


def triangle_counts_df(edges: DataFrame) -> DataFrame:
    """(doc_id, degree, n_triangles) — per-node triangle census of the
    UNDIRECTED provenance graph.

    Graph-density QC for the dedup pipeline: an edge says two docs
    share capped-shingle content, so a triangle is a three-way mutual
    content overlap — triangle-rich neighborhoods are template/mirror
    families (one canonical survives), while a high-degree node with
    zero triangles is a hub stitching UNRELATED docs together (the
    boilerplate signature — its shared content is generic, not a copy
    lineage). Degree alone cannot tell those two apart; the triangle
    count is the cheapest signal that can.

    Mechanics: edges arrive canonical (dst < src by construction), so
    each undirected edge is one (lo, hi) row. Wedges = edges joined to
    edges on the middle vertex (lo=b joined to hi=b gives a<b<c for
    free); triangles = wedges semi-verified against the edge set on
    (a, c). All join keys renamed on both sides (DECISIONS #18). Each
    triangle credits its three corners once; nodes in no triangle
    report 0 via the degree LEFT join (every node has ≥1 edge by
    construction of the edge table).

    Scale shape: the wedge join costs Σ deg(b)² rows — the canonical
    distributed triangle-enumeration bound; the capped-shingle build
    (per-shingle holders ≤ MAX_DF) keeps the provenance graph's degree
    from the pathological all-pairs regime, and the final verify is an
    equi-join against the edge table, not a cartesian. Streaming:
    batch-only by the graph family's rationale — the edge set is only
    final once every earlier doc_id has been seen (the novelty note);
    the incremental path re-censuses on the schedule the edge table
    re-ranks on."""
    e = edges.select(F.col("dst").alias("lo"), F.col("src").alias("hi"))
    ab = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = e.select(F.col("lo").alias("b2"), F.col("hi").alias("c"))
    wedges = ab.join(bc, F.col("b") == F.col("b2")).select("a", "b", "c")
    ac = e.select(F.col("lo").alias("a2"), F.col("hi").alias("c2"))
    tri = wedges.join(
        ac, (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")), "left_semi"
    )
    corners = (
        tri.select(F.col("a").alias("doc_id"))
        .unionByName(tri.select(F.col("b").alias("doc_id")))
        .unionByName(tri.select(F.col("c").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    degree = (
        e.select(F.col("lo").alias("doc_id"))
        .unionByName(e.select(F.col("hi").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return degree.join(corners, "doc_id", "left").select(
        "doc_id",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
    )


def provenance_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle census of the shared provenance edge seam
    (docstring of `triangle_counts_df`)."""
    return triangle_counts_df(edge_frame(spark, sf_dir))



def provenance_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the provenance graph in DOUBLING buckets
    — the graph-QC histogram read before trusting the rank: a healthy
    provenance graph has most docs at low degree with a thin
    authority tail; a fat out-degree tail means one template is being
    "copied" by everything (shingle cap misconfigured). (direction,
    bucket, bucket_lo, n_docs) per in/out side, LENGTH(bin(deg))
    buckets (the repo's no-float doubling trick). Another consumer of
    the edges materialized seam — one O(edges) aggregate per side."""
    return degree_histogram_df(edge_frame(spark, sf_dir))


def degree_histogram_df(edges: DataFrame) -> DataFrame:
    """`provenance_degree_histogram` core over any (src, dst, w)
    edge frame."""
    out_deg = edges.groupBy(F.col("src").alias("doc")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    ).select(F.lit("out").alias("direction"), "deg")
    in_deg = edges.groupBy(F.col("dst").alias("doc")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    ).select(F.lit("in").alias("direction"), "deg")
    both = out_deg.unionByName(in_deg)
    bucket = F.length(F.bin(F.col("deg"))).cast("long")
    return (
        both.select("direction", "deg", bucket.alias("bucket"))
        .groupBy("direction", "bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "direction",
            "bucket",
            F.expr(
                "shiftleft(cast(1 as bigint), cast(bucket - 1 as int))"
            ).alias("bucket_lo"),
            "n_docs",
        )
    )

ORACLE_SQL: dict[str, str] = {
    "doc_provenance_edges": _EDGES_CTE
    + """
    SELECT src, dst, w FROM edges
""",
    "doc_authority_rank": _rank_sql(),
    "doc_label_propagation": _lp_sql(),
    "doc_novelty_scores": _EDGES_CTE
    + """
    SELECT s.doc_id,
           CAST(COUNT(1) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN s.doc_id = c.dst THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST((SUM(CASE WHEN s.doc_id = c.dst THEN 1 ELSE 0 END)
                 * 1000000) // COUNT(1) AS BIGINT) AS novelty_micro
    FROM sh s JOIN canon c USING (shingle)
    GROUP BY s.doc_id
""",
    "provenance_triangles": _EDGES_CTE
    + """,
    e AS (
        SELECT dst AS lo, src AS hi FROM edges
    ),
    tri AS (
        SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c
        FROM e ab
        JOIN e bc ON bc.lo = ab.hi
        WHERE EXISTS (
            SELECT 1 FROM e ac WHERE ac.lo = ab.lo AND ac.hi = bc.hi
        )
    ),
    corners AS (
        SELECT doc_id, COUNT(1) AS n_triangles FROM (
            SELECT a AS doc_id FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ) GROUP BY doc_id
    ),
    degree AS (
        SELECT doc_id, COUNT(1) AS degree FROM (
            SELECT lo AS doc_id FROM e UNION ALL SELECT hi FROM e
        ) GROUP BY doc_id
    )
    SELECT d.doc_id, d.degree,
           CAST(COALESCE(c.n_triangles, 0) AS BIGINT) AS n_triangles
    FROM degree d LEFT JOIN corners c USING (doc_id)
""",
}

ORACLE_SQL["provenance_degree_histogram"] = (
    _EDGES_CTE
    + """
    , degs AS (
        SELECT 'out' AS direction, src AS doc, COUNT(1) AS deg
        FROM edges GROUP BY src
        UNION ALL
        SELECT 'in' AS direction, dst AS doc, COUNT(1) AS deg
        FROM edges GROUP BY dst
    )
    SELECT direction,
           CAST(LENGTH(bin(deg)) AS BIGINT) AS bucket,
           CAST(CAST(1 AS BIGINT)
                << (CAST(LENGTH(bin(deg)) AS INTEGER) - 1) AS BIGINT)
               AS bucket_lo,
           COUNT(1) AS n_docs
    FROM degs GROUP BY direction, LENGTH(bin(deg))
"""
)
