"""Corpus audit checksums: order-independent content fingerprints.

`snapshot_diff` tells you WHAT changed between two corpus copies by
joining their digests — which requires moving one corpus to the other.
An audit CHECKSUM answers the cheaper, more common question first:
*are these two copies identical at all?* — one tiny row per source,
comparable across clusters/regions/engines without moving any data
(ship the checksum table, not the corpus).

`corpus_checksum_by_source` emits, per source plus an all-sources
ROLLUP row: doc count, XOR of each doc's md5-lane content digest
(order-independent by construction — XOR is commutative/associative,
so partitioning and shuffle order cannot change it), the exact char
mass, and the doc_id span. The md5 lane is the repo's engine-agnostic
60-bit hash convention, so a DuckDB- or Trino-side audit job computes
the identical table.

Caveat, stated rather than hidden: XOR cancels PAIRS of identical
docs (A xor A = 0), so the xor lane alone cannot distinguish "corpus"
from "corpus + two copies of some doc" — but `n_docs` and `char_sum`
both move in that case, so the ROW as a whole still detects it. A
sum-mod lane would close even that gap at the cost of a modulus
discipline; the three-field row is the standard practical tradeoff
(DIVERGENCES.md "oracle scope boundaries" #5).

Scale shape: map-side digest + one partial-aggregated rollup — the
cheapest whole-corpus pass possible; at 100 TB this is the nightly
audit job whose output is a types×sources-row table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table


def corpus_checksum_df(docs: DataFrame) -> DataFrame:
    lane = F.expr(
        "cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint)"
    )
    return (
        docs.select(
            "source",
            lane.alias("lane"),
            F.length("text").cast("long").alias("nc"),
            "doc_id",
        )
        .rollup("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("bit_xor(lane)").alias("xor_lane"),
            F.sum("nc").alias("char_sum"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


def corpus_checksum_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source + total audit checksums (module docstring):
    (source, n_docs, xor_lane, char_sum, min_doc_id, max_doc_id);
    the ROLLUP total row carries source = NULL."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "text", "doc_id"
    )
    return corpus_checksum_df(docs)


ORACLE_SQL: dict[str, str] = {
    "corpus_checksum_by_source": """
    SELECT source,
           CAST(COUNT(1) AS BIGINT) AS n_docs,
           CAST(bit_xor(CAST('0x' || substring(md5(text), 1, 15) AS BIGINT))
                AS BIGINT) AS xor_lane,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS char_sum,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM documents
    GROUP BY ROLLUP(source)
""",
}
