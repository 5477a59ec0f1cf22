"""Serving surface: markdown query extraction, ${ref} chaining, hash
caching, JSON rows (SURVEY.md §2.11 E1-E4)."""

from __future__ import annotations

import pytest

from bread_spark.queries import QueryChainError, compile_chained
from bread_spark.serve import QueryService, extract_queries_md
from tests.conftest import SF_DIR

PAGE = """# Dashboard

```sql gas
SELECT o_orderpriority AS pri, COUNT(1) AS n FROM orders GROUP BY 1
```

Some prose.

```sql top_pri
SELECT pri, n FROM ${gas} WHERE n > 0 ORDER BY n DESC, pri LIMIT 3
```
"""


def test_extract_queries_md():
    q = extract_queries_md(PAGE)
    assert set(q) == {"gas", "top_pri"}
    assert q["gas"].startswith("SELECT o_orderpriority")


def test_compile_chained_inlines_refs():
    q = {"a": "SELECT 1 AS x", "b": "SELECT x FROM ${a}"}
    assert compile_chained(q, "b") == "SELECT x FROM (SELECT * FROM (SELECT 1 AS x))"


def test_compile_chained_detects_cycles_and_unknowns():
    with pytest.raises(QueryChainError):
        compile_chained({"a": "SELECT * FROM ${b}", "b": "SELECT * FROM ${a}"}, "a")
    with pytest.raises(QueryChainError):
        compile_chained({"a": "SELECT * FROM ${missing}"}, "a")


def test_page_load_and_cache(spark):
    svc = QueryService(spark, SF_DIR)
    out = svc.run_page(PAGE)
    assert set(out) == {"gas", "top_pri"}
    assert 1 <= len(out["top_pri"]) <= 3
    assert all({"pri", "n"} == set(r) for r in out["gas"])
    n_exec = svc.executions
    # identical page → every compiled hash hits the cache
    svc.run_page(PAGE)
    assert svc.executions == n_exec
    # editing the upstream query invalidates the dependent chain too
    svc.run_page(PAGE.replace("COUNT(1)", "COUNT(*)"))
    assert svc.executions == n_exec + 2


def test_run_registers_view_for_downstream(spark):
    svc = QueryService(spark, SF_DIR)
    svc.run({"daily_n": "SELECT COUNT(1) AS n FROM orders"}, "daily_n")
    assert spark.sql("SELECT n FROM daily_n").first()["n"] > 0
