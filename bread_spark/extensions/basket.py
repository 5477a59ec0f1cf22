"""Market-basket co-occurrence mining over the order⋈part bipartite
fact — the classic association-rules surface (support / confidence /
lift) a merchandising or recommendation stack reads, in the repo's
exact-integer discipline.

- `copurchase_pairs` — top-50 part pairs by co-order support. The
  pair space is generated ONLY inside an order (self-join keyed on
  l_orderkey with the part_a < part_b canonical order), so the
  fan-out per order is C(k,2) with k bounded by the order's line
  count (schema-bounded: ≤7 lines in classic TPC-H, ≤13 in this
  testdata) — the basket-mining analog of "candidates meet only
  inside buckets", and the reason this plan is linear in orders at
  100 TB rather than quadratic in parts.
- `association_rules` — both directions of every pair with support
  ≥ 2, scored with exact integers: confidence_ppm = 1e6·pair div
  n_antecedent; lift_micro = 1e6·pair·N div (n_a·n_c) (lift 1.0 →
  1_000_000), where N (total orders) is a bounded 1-row scalar
  collect (the Q22 pattern) and the n_item counts join back KEYED on
  the part id (the item table is O(parts) — dimension-sized but not
  bounded-by-construction, so no broadcast). Top-50 by
  (lift_micro DESC, antecedent, consequent) — an all-integer total
  order, so the cut is engine-deterministic.

Scale shape: distinct (order, part) → in-order pair self-join (one
orderkey-keyed shuffle; per-key fan-out bounded by order width) →
(part_a, part_b) aggregate with map-side partials → TakeOrderedAndProject
for every top-k. No crossJoin, no global sort, no unbounded collect.

Streaming: batch-only by design — support/lift are whole-corpus
ratios; the incremental path is the additive mergeability of the
(part_a, part_b) and per-item count tables (new order batches append
pair partials; the rules projection recomputes from the merged
aggregates), not operator state.

Reference parity: the reference has no basket/association surface;
additive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

MIN_SUPPORT = 2
TOP_K = 50


def order_part_df(li: DataFrame) -> DataFrame:
    """Distinct (l_orderkey, l_partkey) — multiple lines of the same
    part in one order count once."""
    return li.select("l_orderkey", "l_partkey").distinct()


def pair_counts_df(op: DataFrame) -> DataFrame:
    """(part_a, part_b, pair_count) with part_a < part_b — pairs meet
    only inside their order."""
    a = op.select(
        F.col("l_orderkey").alias("a_okey"), F.col("l_partkey").alias("part_a")
    )
    b = op.select(
        F.col("l_orderkey").alias("b_okey"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(
            b,
            (F.col("a_okey") == F.col("b_okey"))
            & (F.col("part_a") < F.col("part_b")),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )


def order_part_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compute-once distinct (order, part) table — the one full
    lineitem distinct shared by all basket entries (seams
    convention)."""
    from ..plans.materialize import materialized_frame

    return materialized_frame(
        spark,
        "basket.order_part",
        sf_dir,
        lambda: order_part_df(load_table(spark, sf_dir, "lineitem")),
    )


def pair_counts_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compute-once pair-support table — the in-order self-join is the
    family's expensive stage and THREE catalog entries read it
    (pairs top-k, rules, communities); the session pays it once. Plan
    pins target the unmaterialized `pair_counts_df` core per the
    seams convention."""
    from ..plans.materialize import materialized_frame

    return materialized_frame(
        spark,
        "basket.pair_counts",
        sf_dir,
        lambda: pair_counts_df(order_part_frame(spark, sf_dir)),
    )


def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 co-ordered part pairs (module docstring)."""
    return (
        pair_counts_frame(spark, sf_dir)
        .orderBy(F.desc("pair_count"), F.asc("part_a"), F.asc("part_b"))
        .limit(TOP_K)
    )


def association_rules_df(
    op: DataFrame, n_orders: int, pairs: DataFrame | None = None
) -> DataFrame:
    """Rules over any distinct (l_orderkey, l_partkey) frame with the
    order total injected (module docstring). `pairs` lets the catalog
    entry pass the materialized pair seam; tests omit it and pay the
    self-join directly."""
    items = op.groupBy(F.col("l_partkey").alias("item")).agg(
        F.count(F.lit(1)).alias("n_item")
    )
    if pairs is None:
        pairs = pair_counts_df(op)
    pairs = pairs.filter(F.col("pair_count") >= MIN_SUPPORT)
    rules = pairs.select(
        F.col("part_a").alias("antecedent"),
        F.col("part_b").alias("consequent"),
        "pair_count",
    ).unionByName(
        pairs.select(
            F.col("part_b").alias("antecedent"),
            F.col("part_a").alias("consequent"),
            "pair_count",
        )
    )
    ia = items.select(F.col("item").alias("a_item"), F.col("n_item").alias("n_a"))
    ic = items.select(F.col("item").alias("c_item"), F.col("n_item").alias("n_c"))
    scored = (
        rules.join(ia, F.col("antecedent") == F.col("a_item"))
        .join(ic, F.col("consequent") == F.col("c_item"))
        .select(
            "antecedent",
            "consequent",
            "pair_count",
            F.expr(
                "CAST((CAST(pair_count AS DECIMAL(38,0)) * 1000000) div n_a"
                " AS BIGINT)"
            ).alias("confidence_ppm"),
            F.expr(
                f"CAST((CAST(pair_count AS DECIMAL(38,0)) * 1000000"
                f" * CAST({int(n_orders)} AS BIGINT))"
                " div (CAST(n_a AS DECIMAL(38,0)) * n_c) AS BIGINT)"
            ).alias("lift_micro"),
        )
    )
    return scored.orderBy(
        F.desc("lift_micro"), F.asc("antecedent"), F.asc("consequent")
    ).limit(TOP_K)


def association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 association rules by exact-integer lift (module
    docstring)."""
    op = order_part_frame(spark, sf_dir)
    # bounded scalar collect: exactly one row (the global order count)
    n_orders = op.select("l_orderkey").distinct().count()
    return association_rules_df(op, n_orders, pairs=pair_counts_frame(spark, sf_dir))


def copurchase_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product communities: connected components over the support>=2
    co-purchase edges (min-label propagation — the `dedup_clusters`
    loop reused verbatim on the part graph). Nodes are the parts that
    appear in at least one qualifying edge, so the node set is bounded
    by the edge list. Output: (l_partkey, community, community_size)
    with community = the min part id of the component — the
    "frequently bought together" groups a merchandiser reads above
    the pairwise rules.

    Scale shape: inherits the components loop's contract — each round
    one keyed join + one keyed min-aggregate, lineage cut per round,
    driver reads only a changed-count aggregate; rounds = component
    diameter (co-purchase communities are small and dense). Oracle:
    the same recursive-CTE transitive min-label as dedup_clusters.
    Batch-only with the components family's rationale (whole-graph
    fixed point; edges merge additively for the incremental path).

    Compute-once seam: the components loop EXECUTES at frame
    construction (driver-side convergence reads), and the frame is
    touched by the plan fixture, the oracle differential, and the
    invariant tests — `materialized_frame` makes the session pay the
    loop once (the dedup_clusters precedent)."""
    from ..plans.materialize import materialized_frame

    return materialized_frame(
        spark,
        "basket.copurchase_components",
        sf_dir,
        lambda: _components_build(spark, sf_dir),
    )


def _components_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import connected_components

    pairs = (
        pair_counts_frame(spark, sf_dir)
        .filter(F.col("pair_count") >= MIN_SUPPORT)
        .select(F.col("part_a").alias("doc_a"), F.col("part_b").alias("doc_b"))
    )
    nodes = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    labels = connected_components(nodes, pairs).select("doc_id", "cluster_id")
    sizes = labels.groupBy(F.col("cluster_id").alias("sz_label")).agg(
        F.count(F.lit(1)).alias("community_size")
    )
    return labels.join(sizes, F.col("cluster_id") == F.col("sz_label")).select(
        F.col("doc_id").alias("l_partkey"),
        F.col("cluster_id").alias("community"),
        "community_size",
    )


ORACLE_SQL: dict[str, str] = {
    "copurchase_pairs": """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS pair_count
        FROM op a
        JOIN op b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    )
    SELECT part_a, part_b, pair_count
    FROM pairs
    ORDER BY pair_count DESC, part_a, part_b
    LIMIT 50
""",
    "association_rules": """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op),
    items AS (
        SELECT l_partkey AS item, COUNT(*) AS n_item FROM op GROUP BY 1
    ),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS pair_count
        FROM op a
        JOIN op b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
    ),
    rules AS (
        SELECT part_a AS antecedent, part_b AS consequent, pair_count
        FROM pairs
        UNION ALL
        SELECT part_b, part_a, pair_count FROM pairs
    )
    SELECT antecedent, consequent, pair_count,
           CAST((CAST(pair_count AS HUGEINT) * 1000000) // ia.n_item
                AS BIGINT) AS confidence_ppm,
           CAST((CAST(pair_count AS HUGEINT) * 1000000 * n.n_orders)
                // (CAST(ia.n_item AS HUGEINT) * ic.n_item)
                AS BIGINT) AS lift_micro
    FROM rules
    JOIN items ia ON antecedent = ia.item
    JOIN items ic ON consequent = ic.item
    CROSS JOIN n
    ORDER BY lift_micro DESC, antecedent, consequent
    LIMIT 50
""",
    "copurchase_components": """
    WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM op a
        JOIN op b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
    ),
    edges AS (
        SELECT part_a AS src, part_b AS dst FROM pairs
        UNION ALL
        SELECT part_b AS src, part_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    walk(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.src, w.label
        FROM edges e JOIN walk w ON e.dst = w.node
    ),
    labels AS (
        SELECT node, MIN(label) AS community FROM walk GROUP BY node
    ),
    sizes AS (
        SELECT community, COUNT(*) AS community_size
        FROM labels GROUP BY community
    )
    SELECT node AS l_partkey, community, community_size
    FROM labels JOIN sizes USING (community)
""",
}
