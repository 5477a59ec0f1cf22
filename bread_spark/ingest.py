"""Tendermint RPC ingestion client — the landing-zone (bronze) writer.

Re-expresses the reference's extract.py/pipeline.py semantics (SURVEY.md
§2.1 SRC1-SRC9/SRC15-SRC16, §2.9 S1-S6) as a clean driver-side client:
the *source* is a paginated HTTP RPC, not a log, so fetching stays outside
Spark (SURVEY §3.A); Spark takes over at the JSON landing zone.

Differences from the reference are intentional (implement the intent, not
the bugs — SURVEY §7 risks):
  - bounded retries instead of infinite retry loops
  - the sync `extract()` self.tx typo path doesn't exist here
  - watermark metadata is validated against landing-zone filenames
  - dead-letter heights go to a JSON file consumed by a repair plan

HTTP transport is injectable (`fetch_json`) so tests run hermetically and
prod can plug aiohttp/urllib. No Spark dependency in this module.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field
from urllib.parse import urlencode

FetchFn = Callable[[str], dict]  # url -> parsed JSON (raises on failure)


def default_fetch(url: str) -> dict:
    """urllib transport with bounded retry/backoff (reference
    extract.py:349-371 semantics: 429 → long sleep, other errors → short
    sleep; but bounded at MAX_RETRIES instead of infinite)."""
    import urllib.error
    import urllib.request

    MAX_RETRIES = 5
    for attempt in range(MAX_RETRIES):
        try:
            with urllib.request.urlopen(url, timeout=30) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as e:
            if e.code == 429:
                time.sleep(10)
            else:
                time.sleep(5)
            if attempt == MAX_RETRIES - 1:
                raise
        except (urllib.error.URLError, json.JSONDecodeError):
            if attempt == MAX_RETRIES - 1:
                raise
            time.sleep(5)
    raise RuntimeError("unreachable")


# ---------------------------------------------------------------------------
# Range planning (S1/S2: pipeline.py:16-62)
# ---------------------------------------------------------------------------

@dataclass
class SyncRange:
    start: int
    end: int

    def chunks(self, size: int) -> list[tuple[int, int]]:
        """Chunked micro-batching (S6: num_blocks-sized ranges)."""
        out = []
        lo = self.start
        while lo <= self.end:
            hi = min(lo + size - 1, self.end)
            out.append((lo, hi))
            lo = hi + 1
        return out


def determine_sync_range(
    chain_head: int, min_node_height: int, max_ingested: int | None, num_blocks: int
) -> SyncRange:
    """Forward sync window (S1: pipeline.py:16-41):
    start = max(head - num_blocks, last_ingested + 1, node min)."""
    start = max(chain_head - num_blocks, (max_ingested or 0) + 1, min_node_height)
    return SyncRange(start=start, end=chain_head)


def determine_backfill_range(
    min_ingested: int, min_node_height: int, num_blocks: int
) -> SyncRange | None:
    """Backward backfill window (S2: pipeline.py:44-62):
    end = min_ingested - 1 stepping num_blocks toward the node min."""
    end = min_ingested - 1
    if end < min_node_height:
        return None
    start = max(end - num_blocks + 1, min_node_height)
    return SyncRange(start=start, end=end)


# ---------------------------------------------------------------------------
# Chain discovery (SRC5: extract.py:498-514)
# ---------------------------------------------------------------------------

def get_chain_bounds(rpc_url: str, fetch: FetchFn = default_fetch) -> tuple[int, int]:
    """(min_height, max_height) of the node. Max from /abci_info; min by
    probing /block?height=1 — pruned nodes answer with an error naming
    their lowest retained height."""
    info = fetch(f"{rpc_url}/abci_info")
    max_h = int(info["result"]["response"]["last_block_height"])
    probe = fetch(f"{rpc_url}/block?height=1")
    if "error" in probe:
        # "...lowest height is N"
        msg = probe["error"].get("data", "")
        min_h = int(msg.rstrip().rsplit(" ", 1)[-1])
    else:
        min_h = 1
    return min_h, max_h


# ---------------------------------------------------------------------------
# Paginated range extraction (SRC1/SRC2/SRC6/SRC8)
# ---------------------------------------------------------------------------

@dataclass
class Extractor:
    rpc_url: str
    out_dir: str
    network: str = "testnet"
    per_page: int = 100
    # SRC8: bounded-concurrency fetch — the thread-pool size IS the
    # in-flight bound (reference asyncio.Semaphore(10), extract.py:374-406,
    # pipelines/pipeline.py:14). 1 = fully sequential.
    concurrency: int = 10
    fetch: FetchFn = field(default=default_fetch)
    dead_letter: list[int] = field(default_factory=list)

    def _url(self, endpoint: str, query: str, page: int, per_page: int) -> str:
        params = {
            "query": f'"{query}"',
            "page": str(page),
            "per_page": str(per_page),
            # O2: source-side ascending order (reference extract.py:150,169)
            "order_by": '"asc"',
        }
        return f"{self.rpc_url}/{endpoint}?{urlencode(params)}"

    def _paged_scan(self, endpoint: str, query: str, data_key: str, start: int, end: int) -> list[dict]:
        """Full pagination with adaptive page sizing (SRC6: halve per_page
        when a response fails to parse — oversized JSON — and recompute the
        current page from items already consumed; give up at per_page < 1
        and dead-letter the range start)."""
        items: list[dict] = []
        per_page = self.per_page
        page = 1
        while True:
            url = self._url(endpoint, query, page, per_page)
            try:
                resp = self.fetch(url)
            except json.JSONDecodeError:
                per_page //= 2
                if per_page < 1:
                    self.dead_letter.append(start)
                    break
                page = len(items) // per_page + 1
                continue
            result = resp.get("result", {})
            batch = result.get(data_key, [])
            items.extend(batch)
            total = int(result.get("total_count", len(items)))
            if len(items) >= total or not batch:
                break
            page += 1
        return items

    def _paged_scan_concurrent(
        self, endpoint: str, query: str, data_key: str, start: int, end: int
    ) -> list[dict]:
        """SRC8: bounded-concurrency pagination (reference extract.py:374-406).

        Page 1 is fetched alone to learn `total_count` (the reference's
        total-pages precompute, extract.py:440-441); the remaining page
        URLs are generated up front (`generate_urls`, extract.py:295-316)
        and fetched by a thread pool whose size bounds the in-flight
        requests — the Semaphore(n) analog. `ThreadPoolExecutor.map`
        preserves page order, so results are byte-identical to the
        sequential scan.

        Adaptive page-halving (SRC6) can't compose with a prefetched URL
        list (neither does the reference's async path); an oversized
        response anywhere falls back to the sequential adaptive scan for
        the whole range.
        """
        from concurrent.futures import ThreadPoolExecutor

        try:
            first = self.fetch(self._url(endpoint, query, 1, self.per_page))
        except json.JSONDecodeError:
            return self._paged_scan(endpoint, query, data_key, start, end)
        result = first.get("result", {})
        items: list[dict] = list(result.get(data_key, []))
        total = int(result.get("total_count", len(items)))
        if len(items) >= total or not items:
            return items
        n_pages = -(-total // self.per_page)
        urls = [self._url(endpoint, query, p, self.per_page) for p in range(2, n_pages + 1)]
        try:
            with ThreadPoolExecutor(max_workers=self.concurrency) as pool:
                for batch in pool.map(
                    lambda u: self.fetch(u).get("result", {}).get(data_key, []), urls
                ):
                    items.extend(batch)
        except json.JSONDecodeError:
            return self._paged_scan(endpoint, query, data_key, start, end)
        return items

    def _scan(self, endpoint: str, query: str, data_key: str, start: int, end: int) -> list[dict]:
        if self.concurrency > 1:
            return self._paged_scan_concurrent(endpoint, query, data_key, start, end)
        return self._paged_scan(endpoint, query, data_key, start, end)

    def extract_blocks(self, start: int, end: int) -> list[dict]:
        """SRC1: block_search range scan."""
        return self._scan(
            "block_search", f"block.height >= {start} AND block.height <= {end}", "blocks", start, end
        )

    def extract_txs(self, start: int, end: int) -> list[dict]:
        """SRC2: tx_search range scan."""
        return self._scan(
            "tx_search", f"tx.height >= {start} AND tx.height <= {end}", "txs", start, end
        )

    def get_block(self, height: int) -> dict | None:
        """SRC4: point block lookup (`GET /block?height=N`, reference
        extract.py:225) — the repair path's unit of re-fetch."""
        resp = self.fetch(f"{self.rpc_url}/block?height={height}")
        result = resp.get("result")
        if not result:
            return None
        # /block returns {block_id, block}; block_search items share that
        # shape, so point lookups append to the same landing files.
        return {"block_id": result.get("block_id"), "block": result.get("block")}

    def extract_txs_lcd(self, start: int, end: int, page_limit: int = 100) -> list[dict]:
        """SRC3: Cosmos SDK LCD REST scan (reference extract.py:107-141) —
        the alternative endpoint, offset-paginated. Kept for parity and
        node-compatibility; the RPC path is primary (the reference
        measured LCD ~50× slower, extract.py:145)."""
        items: list[dict] = []
        offset = 0
        while True:
            params = urlencode(
                {
                    "events": f"tx.height>={start}",
                    "pagination.limit": str(page_limit),
                    "pagination.offset": str(offset),
                }
            )
            resp = self.fetch(f"{self.rpc_url}/cosmos/tx/v1beta1/txs?{params}")
            batch = resp.get("tx_responses", [])
            items.extend(t for t in batch if int(t.get("height", 0)) <= end)
            total = int(resp.get("pagination", {}).get("total", len(items)))
            offset += len(batch)
            if not batch or offset >= total:
                break
        return items

    def repair_dead_letter(self) -> list[int]:
        """S3: gap fill — re-extract heights recorded in
        errors/error_heights.json via point lookups (SRC4), append them to
        the landing zone as single-height batches, and clear the ledger of
        the heights that succeeded. (The reference's flow has this step
        scaffolded but commented out, pipeline.py:99-109/120-123 —
        implemented here as intended.)"""
        path = os.path.join(self.out_dir, self.network, "errors", "error_heights.json")
        if not os.path.exists(path):
            return []
        with open(path) as f:
            heights = json.load(f)
        repaired: list[int] = []
        for h in heights:
            doc = self.get_block(h)
            if doc is not None:
                self.save_batch([doc], "blocks", h, h)
                txs = self.extract_txs(h, h)
                self.save_batch(txs, "txs", h, h)
                repaired.append(h)
        remaining = sorted(set(heights) - set(repaired))
        with open(path, "w") as f:
            json.dump(remaining, f)
        return repaired

    def save_batch(self, items: list[dict], prefix: str, start: int, end: int) -> str:
        """SRC9: landing-zone sink — JSON-lines (one doc per line) so Spark
        reads each batch file splittably; path mirrors the reference layout
        data/{network}/{prefix}/{start}_{end}.json."""
        d = os.path.join(self.out_dir, self.network, prefix)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{start}_{end}.json")
        with open(path, "w") as f:
            for item in items:
                f.write(json.dumps(item) + "\n")
        return path

    def run_range(self, start: int, end: int) -> dict[str, str]:
        blocks = self.extract_blocks(start, end)
        txs = self.extract_txs(start, end)
        return {
            "blocks": self.save_batch(blocks, "blocks", start, end),
            "txs": self.save_batch(txs, "txs", start, end),
        }

    def flush_dead_letter(self) -> None:
        """SRC16: failed heights → errors/error_heights.json for repair."""
        if not self.dead_letter:
            return
        d = os.path.join(self.out_dir, self.network, "errors")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "error_heights.json")
        existing: list[int] = []
        if os.path.exists(path):
            with open(path) as f:
                existing = json.load(f)
        with open(path, "w") as f:
            json.dump(sorted(set(existing) | set(self.dead_letter)), f)


# ---------------------------------------------------------------------------
# Watermarks from landing-zone filenames (SRC15: extract.py:474-551)
# ---------------------------------------------------------------------------

def ingested_bounds(landing_dir: str) -> tuple[int | None, int | None]:
    """(min, max) ingested height parsed from {start}_{end}.json names
    (P18 filename-range parse + A5 min/max watermark bounds, reference
    extract.py:539-551); (None, None) when the landing zone is empty —
    the reference's FileNotFound→0 path."""
    if not os.path.isdir(landing_dir):
        return None, None
    lo: int | None = None
    hi: int | None = None
    for name in os.listdir(landing_dir):
        if not name.endswith(".json"):
            continue
        stem = name[: -len(".json")]
        try:
            start_s, end_s = stem.split("_")
            start, end = int(start_s), int(end_s)
        except ValueError:
            continue
        lo = start if lo is None else min(lo, start)
        hi = end if hi is None else max(hi, end)
    return lo, hi


def write_metadata(landing_root: str, network: str) -> dict:
    """Persist validated watermarks next to the data (metadata.json).
    Validation = recompute from filenames, the source of truth."""
    blocks_dir = os.path.join(landing_root, network, "blocks")
    lo, hi = ingested_bounds(blocks_dir)
    meta = {"min_ingested_height": lo, "max_ingested_height": hi}
    with open(os.path.join(landing_root, network, "metadata.json"), "w") as f:
        json.dump(meta, f)
    return meta


# ---------------------------------------------------------------------------
# Completeness audit plan (S4: extract.py:229-293) — Spark-side anti-joins
# ---------------------------------------------------------------------------

def audit_missing_blocks(spark, raw_blocks_df, start: int, end: int):
    """Heights in [start, end] absent from the landing zone (J3 anti-join
    against a generated expected-range frame — distributed, unlike the
    reference's Python set difference)."""
    from pyspark.sql import functions as F

    expected = spark.range(start, end + 1).select(F.col("id").alias("height"))
    present = raw_blocks_df.select(F.col("block.header.height").cast("long").alias("height"))
    return expected.join(present, "height", "left_anti")


def audit_missing_txs(spark, raw_blocks_df, raw_txs_df):
    """Blocks whose block.data.txs count exceeds the txs actually landed
    (A6 size/count + J3): returns (height, expected_txs, actual_txs) rows
    needing re-fetch."""
    from pyspark.sql import functions as F

    expected = raw_blocks_df.select(
        F.col("block.header.height").cast("long").alias("height"),
        F.size(F.coalesce(F.col("block.data.txs"), F.array())).alias("expected_txs"),
    )
    actual = (
        raw_txs_df.select(F.col("height").cast("long").alias("height"))
        .groupBy("height")
        .agg(F.count(F.lit(1)).alias("actual_txs"))
    )
    return (
        expected.join(actual, "height", "left")
        .select(
            "height",
            "expected_txs",
            F.coalesce("actual_txs", F.lit(0)).alias("actual_txs"),
        )
        .filter(F.col("expected_txs") > F.col("actual_txs"))
    )
