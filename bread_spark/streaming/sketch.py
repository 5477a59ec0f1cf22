"""Streaming sketch maintenance — the stream-shaped members of the
sketching family (extensions/sketch.py covers the batch forms).

At 100 TB the crawl never stops, and the two questions a corpus
dashboard keeps asking — "how many distinct tokens per source?" and
"how often does each token occur?" — must stay answerable WITHOUT
re-reading history. Both sketches are built here as unbounded streaming
aggregations whose state IS the sketch:

- `hll_register_stream`:  per-source HyperLogLog registers — state is
  O(sources · 64) max-of-rho cells; every micro-batch folds in by MAX,
  which is exactly the sketch's merge operator, so the stream's running
  answer equals the batch sketch over everything seen (pinned in
  tests).
- `cms_sketch_stream`:    the count-min counter table — state is the
  constant D·WIDTH grid; micro-batches fold in by SUM (count-min's
  merge operator).

Both reuse the IDENTICAL expressions as the batch catalog entries
(`hll_registers_df` / `cms_sketch_df`) — a shuffle-free projection plus
one grouped aggregate applies to a streaming frame unchanged, so the
batch entry and the monitor can never disagree. No watermark: the state
is constant-size by construction, the property that makes sketches the
right streaming citizens in the first place. Run in `update`/`complete`
output mode into a dashboard sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..extensions.sketch import cms_sketch_df, hll_registers_df


def hll_register_stream(docs: DataFrame) -> DataFrame:
    """Running per-source HLL register table over a (source, text)
    document stream — the online distinct-count monitor. The streaming
    state is the register table itself: new batches can only raise a
    register (MAX merge), never grow the state past sources · M rows."""
    return hll_registers_df(docs)


def cms_sketch_stream(docs: DataFrame) -> DataFrame:
    """Running count-min counter table over a (text) document stream —
    the online frequency monitor. State is the constant D·WIDTH counter
    grid regardless of how long the stream runs."""
    return cms_sketch_df(docs)
