"""`tendermint_rpc` — a Spark 4 Python DataSource over Tendermint RPC.

The `spark.read.format("tendermint_rpc")` ergonomics sketched in
SURVEY.md §4.3: the reference's paginated block_search/tx_search scans
(extract.py:148-173) exposed as a first-class Spark source instead of a
driver-side download step. Height ranges become input partitions, so the
RPC scan parallelizes across executors and feeds the parse path without
touching a landing zone — useful for ad-hoc range reads; the durable
bronze layer (`ingest.Extractor` → JSON files) stays the default for
replayable pipelines.

Options:
  url        RPC endpoint (required)
  protocol   "blocks" | "txs" (default "blocks")
  start,end  inclusive height range (required)
  chunk      heights per partition (default 1000) — parallelism knob
  per_page   RPC page size (default 100; halves adaptively on oversize)
  transport  "pkg.module:callable" dotted path to a fetch(url)->dict
             (tests inject a mock node; default is the retrying HTTP
             client). A string, because options cross the JVM boundary.

Output schema: height long, payload string — the raw JSON document per
row; downstream parsing is `from_json(payload, RAW_BLOCK_SCHEMA)` etc.,
keeping this source schema-stable while chain payloads evolve.

Scale: each partition is an independent paged scan with the adaptive
page-size and dead-letter behavior of `ingest.Extractor` (SRC6/SRC7) —
1000-executor fan-out is `end-start`/`chunk` partitions; the node's rate
limit, not Spark, is the throughput ceiling (tune `chunk` and
concurrency accordingly).
"""

from __future__ import annotations

import importlib
import json
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import LongType, StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("height", LongType()),
        StructField("payload", StringType()),
    ]
)


def _resolve_transport(spec: str | None):
    if not spec:
        from ..ingest import default_fetch

        return default_fetch
    mod_name, _, fn_name = spec.partition(":")
    return getattr(importlib.import_module(mod_name), fn_name)


class HeightRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class TendermintReader(DataSourceReader):
    def __init__(self, options: dict):
        self.url = options["url"]
        self.protocol = options.get("protocol", "blocks")
        self.start = int(options["start"])
        self.end = int(options["end"])
        self.chunk = int(options.get("chunk", 1000))
        self.per_page = int(options.get("per_page", 100))
        self.transport_spec = options.get("transport")

    def partitions(self) -> list[HeightRange]:
        return [
            HeightRange(lo, min(lo + self.chunk - 1, self.end))
            for lo in range(self.start, self.end + 1, self.chunk)
        ]

    def read(self, partition: HeightRange) -> Iterator[tuple]:
        # Executor-side: build the paged client here (transports resolve
        # by dotted path; a closure can't cross the option boundary).
        from ..ingest import Extractor

        fetch = _resolve_transport(self.transport_spec)
        ex = Extractor(self.url, out_dir="", per_page=self.per_page, fetch=fetch)
        if self.protocol == "blocks":
            for doc in ex.extract_blocks(partition.start, partition.end):
                yield (int(doc["block"]["header"]["height"]), json.dumps(doc))
        else:
            for doc in ex.extract_txs(partition.start, partition.end):
                yield (int(doc["height"]), json.dumps(doc))


class TendermintDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tendermint_rpc"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> TendermintReader:
        return TendermintReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(TendermintDataSource)
