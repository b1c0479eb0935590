"""Provider ingest adapters (SURVEY.md §2.1 S1–S3, S19).

REST kline ingestion is inherently driver-side (a paginated HTTP cursor
loop — ``bybit_downloader.py:81-146``, ``binance_provider.py:36-133``);
it is NOT a cluster scan and never will be: the API caps pages at 1000
rows and rate-limits. The Spark boundary is ``klines_to_df``: raw pages
become a typed DataFrame once, and everything downstream is
distributed.

Network access is injected (``fetch=``): the real HTTP callables are
gated behind a ``requests`` import-try, tests drive the pagination /
typing logic with fakes, and the retry/backoff/rate-limit wrapper (S19,
``data_cleaner.py:458-531``) is a pure driver utility.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Raw kline page schemas (string-typed, as the APIs return them).
# Bybit /v5/market/kline: 7 fields (``bybit_downloader.py:126-137``);
# Binance klines: 12 fields, 6 kept (``binance_provider.py:102-126``).
BYBIT_COLS = ["timestamp", "open", "high", "low", "close", "volume", "turnover"]
BINANCE_COLS_KEPT = ["timestamp", "open", "high", "low", "close", "volume"]


def _to_ms(d: str | datetime | None, default_days_back: int = 30) -> int:
    if d is None:
        d = datetime.now(timezone.utc) - timedelta(days=default_days_back)
    if isinstance(d, str):
        d = datetime.strptime(d, "%Y-%m-%d").replace(tzinfo=timezone.utc)
    elif d.tzinfo is None:
        d = d.replace(tzinfo=timezone.utc)
    return int(d.timestamp() * 1000)


def klines_to_df(
    spark: SparkSession,
    rows: Sequence[Sequence],
    columns: list[str],
    symbol: str | None = None,
    epoch_unit: str = "ms",
) -> DataFrame:
    """Typed DataFrame from raw kline rows: epoch→UTC timestamp, numeric
    casts (string junk → null, pandas-coerce parity), optional symbol.
    """
    if not rows:
        schema = T.StructType(
            [T.StructField(c, T.StringType()) for c in columns]
        )
        df = spark.createDataFrame([], schema)
    else:
        df = spark.createDataFrame(
            [[str(v) for v in r[: len(columns)]] for r in rows], columns
        )
    epoch = F.col("timestamp").cast("double")
    ts = (
        F.timestamp_millis(epoch.cast("long"))
        if epoch_unit == "ms"
        else F.timestamp_seconds(epoch)
    )
    out = df.withColumn("timestamp", ts)
    for c in columns:
        if c != "timestamp":
            out = out.withColumn(c, F.col(c).cast("double"))
    if symbol is not None:
        out = out.withColumn("symbol", F.lit(symbol))
    return out


def paginate_klines(
    fetch: Callable[[int], Sequence[Sequence]],
    start_ms: int,
    end_ms: int,
    pause_s: float = 0.0,
    cursor_next: Callable[[int], int] = lambda last: last,
) -> list:
    """Cursor pagination: call ``fetch(cursor)`` until the page is empty,
    the cursor stops advancing, or the last row passes ``end_ms``.

    Exactly the reference's loop (``bybit_downloader.py:107-122``;
    Binance advances the cursor to last+1, ``binance_provider.py:95`` —
    pass ``cursor_next=lambda t: t + 1``). ``fetch`` returns rows whose
    field 0 is an epoch-ms timestamp.
    """
    out: list = []
    cursor = start_ms
    while cursor < end_ms:
        page = list(fetch(cursor))
        if not page:
            break
        out.extend(page)
        last = int(page[-1][0])
        nxt = cursor_next(last)
        if nxt <= cursor:
            break
        cursor = nxt
        if last >= end_ms:
            break
        if pause_s:
            time.sleep(pause_s)
    return out


def download_history(
    spark: SparkSession,
    symbol: str,
    fetch: Callable[[int], Sequence[Sequence]],
    start: str | datetime | None = None,
    end: str | datetime | None = None,
    columns: list[str] | None = None,
    pause_s: float = 0.0,
    cursor_next: Callable[[int], int] = lambda last: last,
) -> DataFrame:
    """S2/S3: paginated download → typed DataFrame, trimmed to the exact
    [start, end] range (``bybit_downloader.py:143``)."""
    start_ms, end_ms = _to_ms(start), _to_ms(end, default_days_back=0)
    rows = paginate_klines(fetch, start_ms, end_ms, pause_s, cursor_next)
    df = klines_to_df(spark, rows, columns or BYBIT_COLS, symbol=symbol)
    lo = F.timestamp_millis(F.lit(start_ms))
    hi = F.timestamp_millis(F.lit(end_ms))
    return df.filter(F.col("timestamp").between(lo, hi))


def bybit_fetch(
    symbol: str, interval: str, limit: int = 1000, category: str = "spot"
) -> Callable[[int], list]:
    """S1: real Bybit kline fetcher (gated on ``requests``)."""
    try:
        import requests
    except ImportError as exc:  # pragma: no cover - not installed here
        raise NotImplementedError(
            "requests is not available; inject a fetch callable"
        ) from exc

    def fetch(start_ms: int) -> list:  # pragma: no cover - network
        resp = requests.get(
            "https://api.bybit.com/v5/market/kline",
            params={
                "category": category,
                "symbol": symbol,
                "interval": interval,
                "start": start_ms,
                "limit": limit,
            },
            timeout=30,
        )
        resp.raise_for_status()
        rows = resp.json().get("result", {}).get("list", [])
        return sorted(rows, key=lambda r: int(r[0]))

    return fetch


# ---------------------------------------------------------------------------
# S19: retry / backoff / rate limit (driver-side ingest resilience)
# ---------------------------------------------------------------------------


def with_retry(
    fn: Callable[[], object],
    retries: int = 3,
    backoff_s: float = 1.0,
    backoff_factor: float = 2.0,
    retry_on: tuple[type[Exception], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
) -> object:
    """Exponential-backoff retry (``data_cleaner.py:458-531``): attempt
    up to 1+retries times, sleeping backoff·factor^i between failures."""
    delay = backoff_s
    for attempt in range(retries + 1):
        try:
            return fn()
        except retry_on:
            if attempt == retries:
                raise
            sleep(delay)
            delay *= backoff_factor
    raise AssertionError("unreachable")


def fetch_with_rate_limit(
    get: Callable[[str], object],
    url: str,
    rate_limit_delay: float = 1.0,
    max_attempts: int = 5,
    limiter: "RateLimiter | None" = None,
    sleep: Callable[[float], None] = time.sleep,
    transport_errors: tuple[type[Exception], ...] = (IOError,),
    retry_after_cap: float = 120.0,
):
    """Rate-limit-aware fetch (``data_cleaner.py:556-595``): pace via
    ``limiter``, then attempt up to ``max_attempts`` times.

    - HTTP 429 → honor the server's ``Retry-After`` header when present
      and a sane number of seconds (``0 <= v <= retry_after_cap``),
      else exponential backoff ``delay·2^attempt``; retry. RFC 7231
      also allows an HTTP-date ``Retry-After`` — a non-numeric value
      falls back to the exponential schedule instead of raising out of
      the retry loop, and so does an out-of-range numeric one: a
      negative value would make ``time.sleep`` raise ``ValueError``
      and escape the loop, a huge one would stall the client
      unboundedly.
    - HTTP 200 → return ``response.json()``.
    - other statuses → ``response.raise_for_status()``.
    - transport errors → flat ``rate_limit_delay`` sleep and retry;
      re-raised on the final attempt.

    ``get`` is injected (``get(url)`` returning a response with
    ``status_code`` / ``headers`` / ``json()`` / ``raise_for_status()``)
    so tests drive the pacing logic with fakes and the live path plugs
    ``requests.Session.get`` straight in. Returns ``None`` when every
    attempt was rate-limited (the reference's exhausted-retries
    contract)."""
    for attempt in range(max_attempts):
        # pace every attempt, not just the first — a retry is a new
        # request against the same budget
        if limiter is not None:
            limiter.wait(url)
        try:
            resp = get(url)
        except transport_errors:
            if attempt == max_attempts - 1:
                raise
            sleep(rate_limit_delay)
            continue
        status = getattr(resp, "status_code", 200)
        if status == 429:
            retry_after = (getattr(resp, "headers", None) or {}).get(
                "Retry-After"
            )
            delay = rate_limit_delay * (2**attempt)
            if retry_after is not None:
                try:
                    parsed = float(retry_after)
                    # clamp: negative would raise out of sleep(),
                    # huge would stall unboundedly — both fall back
                    # to the exponential schedule
                    if 0.0 <= parsed <= retry_after_cap:
                        delay = parsed
                except (TypeError, ValueError):
                    pass  # HTTP-date form → exponential fallback
            sleep(delay)
            continue
        if status == 200:
            return resp.json()
        resp.raise_for_status()
    return None


def fetch_with_timeout(
    get: Callable[..., object],
    url: str,
    timeout: float = 30.0,
    limiter: "RateLimiter | None" = None,
    timeout_errors: tuple[type[Exception], ...] = (TimeoutError,),
):
    """Deadline-wrapped fetch (``data_cleaner.py:690-702``): pass the
    timeout to the transport, normalize its timeout exception to a
    built-in ``TimeoutError`` naming the url and budget — callers pick
    one except-clause regardless of HTTP library."""
    if limiter is not None:
        limiter.wait(url)
    try:
        resp = get(url, timeout=timeout)
    except timeout_errors as exc:
        raise TimeoutError(
            f"Request to {url} timed out after {timeout}s"
        ) from exc
    resp.raise_for_status()
    return resp.json()


class CachedFetcher:
    """Page cache with freshness window + stale-data recovery
    (``data_cleaner.py:612-661``) — the missing-half of S19 that lets a
    long harvest survive a flaky API:

    1. a cache entry younger than ``max_age_s`` is served directly;
    2. expired/missing/corrupt cache → fetch fresh, write-through;
    3. the fetch FAILED → fall back to the stale entry (explicitly
       better than nothing mid-harvest), re-raise only when there is
       no cache at all.

    JSON files under ``cache_dir`` keyed by caller-chosen cache key;
    ``clock`` injected for freshness tests. Driver-side by design —
    this guards the paginated REST cursor loop, not a cluster scan."""

    def __init__(
        self,
        cache_dir: str,
        max_age_s: float = 24 * 3600.0,
        clock: Callable[[], float] = time.time,
    ) -> None:
        import os

        self.cache_dir = cache_dir
        self.max_age_s = max_age_s
        self._clock = clock
        os.makedirs(cache_dir, exist_ok=True)

    def _path(self, key: str) -> str:
        import os

        safe = "".join(c if c.isalnum() or c in "-_." else "_" for c in key)
        return os.path.join(self.cache_dir, f"{safe}.json")

    def _read(self, key: str):
        import json

        with open(self._path(key), encoding="utf-8") as f:
            return json.load(f)

    def _age_s(self, key: str) -> float:
        import os

        return self._clock() - os.stat(self._path(key)).st_mtime

    def get(self, key: str, fetch: Callable[[], object]):
        """Fresh-cache hit, else fetch+write-through, else stale cache."""
        import json
        import os

        path = self._path(key)
        try:
            if os.path.exists(path) and self._age_s(key) < self.max_age_s:
                return self._read(key)
        except (json.JSONDecodeError, KeyError, OSError):
            pass  # corrupt/vanished cache — fall through to the fetch
        try:
            fresh = fetch()
        except Exception:
            # stale fallback: any readable cache beats a dead harvest
            if os.path.exists(path):
                try:
                    return self._read(key)
                except (json.JSONDecodeError, OSError):
                    pass  # cache is corrupt too — surface the fetch error
            raise
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(fresh, f, default=str)
        os.replace(tmp, path)
        return fresh


class RateLimiter:
    """Per-endpoint min-interval limiter (``data_cleaner.py:555-595``)."""

    def __init__(
        self,
        min_interval_s: float = 1.0,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.min_interval_s = min_interval_s
        self._clock = clock
        self._sleep = sleep
        self._last: dict[str, float] = {}

    def wait(self, endpoint: str = "") -> None:
        now = self._clock()
        last = self._last.get(endpoint)
        if last is not None:
            remaining = self.min_interval_s - (now - last)
            if remaining > 0:
                self._sleep(remaining)
        self._last[endpoint] = self._clock()
