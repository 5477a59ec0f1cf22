"""Query-serving surface — the Evidence/BV-proxy analog (SURVEY.md §2.11,
§2.1 SRC17, §3 entry point C).

The reference serves dashboards by extracting named SQL blocks from
markdown, inlining ``${ref}`` chains, md5-caching compiled text, and
executing against DuckDB behind a Postgres-wire proxy
(extractQueries.server.js:17-103, profiles.yml:7-14). Here the same
surface is a thin class over one SparkSession:

- named queries with ``${ref}`` chaining  (E1/E2 → `queries.compile_chained`)
- compiled-text hash caching              (E3 → results cached per md5)
- JSON row serving                        (E4 → `run_json`)
- markdown extraction                     (E1 → `extract_queries_md`)
- serving queries run verbatim over the registered gold/testdata views
  (E5 — the reference's `select cast(gas_used as int) ...` page query is
  just a `run_json` call here)

For multi-client serving the same registry sits behind Spark Connect —
`python -m bread_spark.connect --port 15002 --sf-dir ...` brings up the
gRPC endpoint (see `bread_spark/connect.py`, the BV-proxy analog); the
registered temp views serve as-is. Nothing in this module is driver-local
state beyond the cache dict.
"""

from __future__ import annotations

import hashlib
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .io import register_views
from .queries import compile_chained

# ```sql name\n ... \n``` — the Evidence markdown convention (E1).
_SQL_BLOCK_RE = re.compile(r"```sql\s+(\w+)\s*\n(.*?)```", re.DOTALL)


def extract_queries_md(markdown: str) -> dict[str, str]:
    """Pull named ```sql blocks out of a markdown page (E1 semantics:
    the block's info-string word is the query name)."""
    return {m.group(1): m.group(2).strip() for m in _SQL_BLOCK_RE.finditer(markdown)}


class QueryService:
    """Named-query serving with chaining and compiled-text caching.

    Cache key = md5 of the *compiled* SQL (post-inlining), so editing any
    upstream query in a chain invalidates its dependents — exactly the
    reference's staleness rule (extractQueries.server.js:17-31).
    """

    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        self.spark = spark
        self._cache: dict[str, list[dict[str, Any]]] = {}
        self.executions = 0  # observable for tests / metrics
        if sf_dir is not None:
            register_views(spark, sf_dir)

    def compile(self, queries: dict[str, str], name: str) -> str:
        return compile_chained(queries, name)

    def run(self, queries: dict[str, str], name: str) -> DataFrame:
        """Execute one named query (chains inlined); registers the result
        as a temp view so later queries can reference it by plain name."""
        df = self.spark.sql(self.compile(queries, name))
        df.createOrReplaceTempView(name)
        return df

    def run_json(self, queries: dict[str, str], name: str) -> list[dict[str, Any]]:
        """Serve rows as JSON-able dicts, cached by compiled-SQL hash.

        Serving queries are small by contract (gold tables, dashboard
        shapes) — collect is bounded; big results belong behind
        Connect/Thrift, not this path.
        """
        compiled = self.compile(queries, name)
        key = hashlib.md5(compiled.encode()).hexdigest()
        if key not in self._cache:
            self.executions += 1
            df = self.spark.sql(compiled)
            df.createOrReplaceTempView(name)
            self._cache[key] = [row.asDict(recursive=True) for row in df.collect()]
        return self._cache[key]

    def run_page(self, markdown: str) -> dict[str, list[dict[str, Any]]]:
        """Full page load (entry point C): extract named queries from the
        markdown, execute each with chaining, return {name: rows}."""
        queries = extract_queries_md(markdown)
        return {name: self.run_json(queries, name) for name in queries}
