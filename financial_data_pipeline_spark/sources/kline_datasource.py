"""Partition-parallel kline ingestion as a Spark 4 Python DataSource.

The reference ingests klines with a driver-side paginated HTTP loop
(``bybit_downloader.py:81-146``, ``binance_provider.py:36-133``) —
single-threaded, one symbol at a time. ``sources/providers.py`` keeps
that loop for strict parity; THIS module is the Spark-first upgrade:
the provider becomes a first-class ``spark.read.format("kline")``
source where every (symbol, page window) is an ``InputPartition`` —
1000 symbols × history pages fan out across the whole cluster, each
task paging its own shard under its own rate limit, and the result is
a DataFrame from the first operator on (no driver materialization).

Filter pushdown (Spark 4.1 ``pushFilters``): ``symbol =/IN`` prunes
whole symbol slices and timestamp range predicates prune page
partitions BEFORE any fetch happens — the planner never schedules a
task for data the query doesn't want. Pushed filters are fully
honored (partition pruning + exact row filtering), per the API
contract that Spark does not re-apply them.

Network seam: the container has no network and no ``requests``, so
``fetch_page`` is a deterministic synthetic generator (seeded per
(symbol, page) — reproducible across reads and executors). A real
HTTP fetcher is a drop-in replacement with the same signature; the
partitioning, pushdown, pagination, and typing logic — the parts that
matter — are real and tested.

Also ships the streaming twin (``spark.readStream.format("kline")``)
via ``SimpleDataSourceStreamReader``: the page cursor IS the stream
offset, so each micro-batch ingests the next page per symbol —
exactly-once via offset replay, the Structured Streaming rendering of
the reference's incremental cursor (``sources/incremental.py``).
"""

from __future__ import annotations

import math
from datetime import datetime, timezone
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

KLINE_SCHEMA = (
    "symbol string, timestamp timestamp, open double, high double, "
    "low double, close double, volume double"
)

_MS_MIN = 60_000


def _seed(symbol: str, page_start_ms: int) -> int:
    # Deterministic, executor-portable seed (no Python hash()
    # randomization): djb2 over the symbol mixed with the page cursor.
    h = 5381
    for ch in symbol:
        h = ((h * 33) ^ ord(ch)) & 0x7FFFFFFF
    return (h * 1_000_003 + page_start_ms // _MS_MIN) & 0x7FFFFFFF


def fetch_page(
    symbol: str, page_start_ms: int, n_rows: int, interval_ms: int
) -> list[tuple]:
    """One kline page: the injected-fetch seam (HTTP drop-in point).

    Deterministic synthetic bars: seeded log-walk around a per-symbol
    base price; OHLC invariants hold by construction (high ≥
    max(open, close), low ≤ min(open, close), all > 0).
    """
    import numpy as np

    rng = np.random.default_rng(_seed(symbol, page_start_ms))
    base = 100.0 + (_seed(symbol, 0) % 900)
    steps = rng.normal(0.0, 0.002, n_rows)
    close = base * np.exp(np.cumsum(steps))
    open_ = np.concatenate(([base], close[:-1]))
    spread = np.abs(rng.normal(0.0, 0.001, n_rows)) * close
    high = np.maximum(open_, close) + spread
    low = np.minimum(open_, close) - spread
    vol = np.abs(rng.normal(50.0, 20.0, n_rows)) + 1.0
    out = []
    for i in range(n_rows):
        ts = datetime.fromtimestamp(
            (page_start_ms + i * interval_ms) / 1000.0, tz=timezone.utc
        )
        out.append(
            (
                symbol,
                ts,
                float(open_[i]),
                float(high[i]),
                float(low[i]),
                float(close[i]),
                float(vol[i]),
            )
        )
    return out


class KlinePartition(InputPartition):
    def __init__(self, symbol: str, start_ms: int, end_ms: int, interval_ms: int):
        self.symbol = symbol
        self.start_ms = start_ms
        self.end_ms = end_ms
        self.interval_ms = interval_ms


def _parse_opts(options) -> dict:
    symbols = [
        s.strip() for s in options.get("symbols", "BTCUSDT").split(",") if s.strip()
    ]
    start = options.get("start", "2025-01-01")
    end = options.get("end", "2025-01-02")

    def ms(d: str) -> int:
        dt = datetime.strptime(d, "%Y-%m-%d").replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1000)

    return {
        "symbols": symbols,
        "start_ms": ms(start),
        "end_ms": ms(end),
        "interval_ms": int(options.get("interval_minutes", "1")) * _MS_MIN,
        "page_rows": int(options.get("page_rows", "1000")),
    }


def _to_ms_bound(v) -> int:
    if isinstance(v, datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        return int(v.timestamp() * 1000)
    raise TypeError(f"unsupported timestamp literal {v!r}")


class KlineReader(DataSourceReader):
    """Batch reader: one InputPartition per (symbol, page window)."""

    def __init__(self, options):
        self.cfg = _parse_opts(options)
        self.keep_symbols: set[str] | None = None
        self.ts_lo_ms: int | None = None  # inclusive
        self.ts_hi_ms: int | None = None  # exclusive

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("symbol",):
                self.keep_symbols = {f.value}
            elif isinstance(f, In) and f.attribute == ("symbol",):
                self.keep_symbols = set(f.value)
            elif isinstance(f, GreaterThanOrEqual) and f.attribute == ("timestamp",):
                self.ts_lo_ms = _to_ms_bound(f.value)
            elif isinstance(f, GreaterThan) and f.attribute == ("timestamp",):
                self.ts_lo_ms = _to_ms_bound(f.value) + 1
            elif isinstance(f, LessThan) and f.attribute == ("timestamp",):
                self.ts_hi_ms = _to_ms_bound(f.value)
            elif isinstance(f, LessThanOrEqual) and f.attribute == ("timestamp",):
                self.ts_hi_ms = _to_ms_bound(f.value) + 1
            else:
                yield f  # not pushed — Spark keeps this one

    def partitions(self) -> list[KlinePartition]:
        c = self.cfg
        lo = c["start_ms"] if self.ts_lo_ms is None else max(c["start_ms"], self.ts_lo_ms)
        hi = c["end_ms"] if self.ts_hi_ms is None else min(c["end_ms"], self.ts_hi_ms)
        page_ms = c["page_rows"] * c["interval_ms"]
        parts = []
        for sym in c["symbols"]:
            if self.keep_symbols is not None and sym not in self.keep_symbols:
                continue
            # page grid is anchored at start_ms so pushdown never
            # changes page identity (and thus never changes the data)
            first = c["start_ms"] + ((lo - c["start_ms"]) // page_ms) * page_ms
            for p0 in range(first, hi, page_ms):
                parts.append(
                    KlinePartition(sym, p0, min(p0 + page_ms, c["end_ms"]), c["interval_ms"])
                )
        return parts

    def read(self, part: KlinePartition) -> Iterator[tuple]:
        n = math.ceil((part.end_ms - part.start_ms) / part.interval_ms)
        for row in fetch_page(part.symbol, part.start_ms, n, part.interval_ms):
            ms = int(row[1].timestamp() * 1000)
            if self.ts_lo_ms is not None and ms < self.ts_lo_ms:
                continue
            if self.ts_hi_ms is not None and ms >= self.ts_hi_ms:
                continue
            yield row


class KlineStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin: offset = {"cursor_ms": next page start}. Each
    micro-batch reads ONE page per symbol and advances the cursor —
    deterministic replay from any offset gives exactly-once."""

    def __init__(self, options):
        self.cfg = _parse_opts(options)

    def initialOffset(self) -> dict:
        return {"cursor_ms": self.cfg["start_ms"]}

    def read(self, start: dict):
        c = self.cfg
        cur = int(start["cursor_ms"])
        page_ms = c["page_rows"] * c["interval_ms"]
        if cur >= c["end_ms"]:
            return iter([]), start  # exhausted: empty batch, same offset
        end = min(cur + page_ms, c["end_ms"])
        rows: list[tuple] = []
        for sym in c["symbols"]:
            n = math.ceil((end - cur) / c["interval_ms"])
            rows.extend(fetch_page(sym, cur, n, c["interval_ms"]))
        return iter(rows), {"cursor_ms": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows, _ = self.read(start)
        return rows


class KlineDataSource(DataSource):
    """``spark.dataSource.register(KlineDataSource)`` then
    ``spark.read.format("kline").option("symbols", "BTCUSDT,ETHUSDT")
    .option("start", "2025-01-01").option("end", "2025-01-03").load()``
    (same options for ``readStream``)."""

    @classmethod
    def name(cls) -> str:
        return "kline"

    def schema(self) -> str:
        return KLINE_SCHEMA

    def reader(self, schema: StructType) -> KlineReader:
        return KlineReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> KlineStreamReader:
        return KlineStreamReader(self.options)
