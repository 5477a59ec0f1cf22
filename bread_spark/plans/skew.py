"""Skew mitigation — explicit salting for the cases AQE can't fix.

AQE's skew-join handling (on in `session.get_spark`) splits oversized
sort-merge partitions at runtime, and hash aggregation already does
map-side partial combine. What's left for explicit salting:

- **shuffle-hash/broadcast-impossible joins on a hot key**: AQE splits
  the big side's partition, but every split still collides with the same
  build rows; salting replicates the small side so hot-key work spreads
  across `n_salts` reducers.
- **two-stage aggregation of hash-unfriendly aggregates** (exact
  distinct, collect-heavy aggs): a hot group's values all land in one
  reducer; pre-aggregating on (key, salt) bounds any single task.

Salts are *content-derived* (`xxhash64 % n`), never `rand()` — plans stay
deterministic and retryable (a rand salt changes on task retry, which can
duplicate or drop rows under speculative execution).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def _content_salt(cols: Sequence[str], n_salts: int) -> Column:
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = DEFAULT_SALTS,
    salt_source: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `big` has skewed keys and `small` is too large to
    broadcast: salt the big side from its own row content, replicate the
    small side across all salt values, join on (key, salt).

    The hot key's rows now hash to `n_salts` different reducers; cost is
    an `n_salts`× blow-up of the small side's shuffle (explode before the
    exchange). Columns out = big's + small's non-key columns, same as the
    plain join.
    """
    salt_cols = list(salt_source) if salt_source else [c for c in big.columns if c != key]
    b = big.withColumn("__salt", _content_salt(salt_cols, n_salts))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(n_salts)]))
    )
    return b.join(s, [key, "__salt"], how).drop("__salt")


def salted_distinct_count(
    df: DataFrame, group_key: str, value_col: str, n_salts: int = DEFAULT_SALTS
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key, two-stage: distinct on
    (key, salt-of-value, value) spreads a hot key's dedup state over
    `n_salts` tasks, then per-salt counts sum. Same result as the direct
    `countDistinct`, but no single reducer ever holds a hot key's whole
    value set.
    """
    salted = df.select(
        group_key, F.col(value_col), _content_salt([value_col], n_salts).alias("__salt")
    )
    per_salt = (
        salted.distinct()
        .groupBy(group_key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return per_salt.groupBy(group_key).agg(F.sum("__partial").alias("n_distinct"))
