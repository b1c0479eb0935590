"""Sources/sinks coverage: S4 synthetic, S6/S7/S9/S10 file sinks + S11
archive round-trip, S13/S14 upsert SQL + injected-executor sink,
S1–S3/S19 provider pagination and resilience utilities."""

import time

import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_spark.sources import providers, sinks, synthetic
from financial_data_pipeline_spark.sources.readers import (
    read_archive,
    read_csv,
    read_parquet,
)


# ---------------------------------------------------------------------------
# S4 synthetic generator
# ---------------------------------------------------------------------------


def test_synthetic_ohlcv_shape_and_determinism(spark):
    df = synthetic.synthetic_ohlcv(
        spark, ["BTCUSDT", "ETHUSDT"], "2025-01-01", "2025-01-02", 60, seed=7
    )
    rows = df.collect()
    assert len(rows) == 2 * 25  # inclusive end, 24h at 1h
    assert set(df.columns) == {
        "symbol", "timestamp", "open", "high", "low", "close", "volume",
        "hour", "day_of_week", "month", "year",
    }
    # deterministic: re-generate → identical values
    again = synthetic.synthetic_ohlcv(
        spark, ["BTCUSDT", "ETHUSDT"], "2025-01-01", "2025-01-02", 60, seed=7
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # reference construction invariants: high ≥ close ≥ low, volume > 0
    for r in rows:
        assert r["high"] >= r["close"] >= r["low"]
        assert r["volume"] > 0
    # per-symbol base prices differ
    by_sym = {r["symbol"]: r["close"] for r in rows}
    assert by_sym["BTCUSDT"] > 10 * by_sym["ETHUSDT"]


# ---------------------------------------------------------------------------
# File sinks + archive round-trip
# ---------------------------------------------------------------------------


def test_file_sinks_round_trip(spark, ohlcv_df, tmp_path):
    df = ohlcv_df.limit(100)
    sinks.write_parquet(df, str(tmp_path / "p"))
    assert read_parquet(spark, str(tmp_path / "p")).count() == 100
    sinks.write_csv(df, str(tmp_path / "c"))
    got = read_csv(spark, str(tmp_path / "c"))
    assert got.count() == 100 and set(got.columns) == set(df.columns)
    sinks.write_json(df, str(tmp_path / "j"))
    assert spark.read.json(str(tmp_path / "j")).count() == 100


def test_archive_write_prune_read(spark, tmp_path):
    df = synthetic.synthetic_ohlcv(
        spark, ["BTCUSDT", "ETHUSDT"], "2025-01-15", "2025-03-15", 360, seed=3
    )
    root = str(tmp_path / "archives")
    manifest = sinks.write_archive(df, root)
    # manifest covers every (year, month, symbol) partition
    assert manifest.count() == 2 * 3  # Jan, Feb, Mar × 2 symbols
    # Hive layout on disk
    assert (tmp_path / "archives" / "year=2025" / "month=2").exists()

    got = read_archive(
        spark, root, symbol="BTCUSDT", start="2025-02-01", end="2025-02-28"
    )
    assert got.select("symbol").distinct().collect()[0][0] == "BTCUSDT"
    months = {r[0] for r in got.select("month").distinct().collect()}
    assert months == {2}
    # partition pruning is visible in the plan (not a full scan)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # round-trip values survive (same rows as a direct filter)
    direct = df.filter(
        (F.col("symbol") == "BTCUSDT")
        & F.col("timestamp").between("2025-02-01", "2025-02-28")
    )
    assert got.count() == direct.count()


# ---------------------------------------------------------------------------
# S13/S14 upsert
# ---------------------------------------------------------------------------


def test_upsert_sql_statements():
    sql = sinks.upsert_sql("ohlcv", ["timestamp", "symbol", "close"], ["timestamp", "symbol"])
    assert sql == (
        "INSERT INTO ohlcv (timestamp, symbol, close) VALUES %s "
        "ON CONFLICT (timestamp, symbol) DO UPDATE SET close = EXCLUDED.close"
    )
    sql2 = sinks.insert_ignore_sql("t", ["a", "b"], ["a"])
    assert sql2.endswith("ON CONFLICT (a) DO NOTHING")


def test_jdbc_upsert_batches_with_injected_executor(spark, tmp_path):
    df = spark.range(25).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).coalesce(1)
    # executor must be picklable for foreachPartition → record to a file
    out = tmp_path / "batches.txt"

    def executor(dsn, sql, rows, page_size):
        with open(out, "a") as f:
            f.write(f"{len(rows)}\n")

    sinks.jdbc_upsert(
        df, "dsn://x", "t", ["id"], batch_size=10, executor=executor
    )
    batches = [int(x) for x in out.read_text().split()]
    assert sum(batches) == 25
    assert max(batches) <= 10


# ---------------------------------------------------------------------------
# Providers: pagination, typing, resilience
# ---------------------------------------------------------------------------


def _mk_pages(start_ms, n_pages, per_page, step_ms=60_000):
    pages = []
    t = start_ms
    for _ in range(n_pages):
        page = [
            [t + i * step_ms, "100.0", "101.0", "99.0", "100.5", "10.0", "1000.0"]
            for i in range(per_page)
        ]
        pages.append(page)
        t += per_page * step_ms
    return pages


def test_paginate_klines_cursor_loop():
    start = 1_700_000_000_000
    pages = _mk_pages(start, 3, 5)
    calls = []

    def fetch(cursor):
        calls.append(cursor)
        for p in pages:
            if int(p[0][0]) >= cursor and int(p[-1][0]) > cursor:
                return p
        return []

    rows = providers.paginate_klines(
        fetch, start, start + 100 * 60_000, cursor_next=lambda t: t + 1
    )
    assert len(rows) == 15
    assert len(calls) == 4  # 3 pages + terminating empty fetch
    # Bybit-style cursor (next = last ts) must also terminate
    rows2 = providers.paginate_klines(
        lambda c: pages[0] if c == start else [], start, start + 10**9
    )
    assert len(rows2) == 5


def test_download_history_types_and_trims(spark):
    start = 1_700_000_000_000
    pages = _mk_pages(start, 2, 10)

    def fetch(cursor):
        return pages.pop(0) if pages else []

    from datetime import datetime, timezone

    lo = datetime.fromtimestamp(start / 1000, tz=timezone.utc)
    hi = datetime.fromtimestamp((start + 14 * 60_000) / 1000, tz=timezone.utc)
    df = providers.download_history(
        spark, "BTCUSDT", fetch, start=lo, end=hi, cursor_next=lambda t: t + 1
    )
    rows = df.collect()
    assert len(rows) == 15  # trimmed to [start, end] inclusive
    assert dict(df.dtypes)["close"] == "double"
    assert dict(df.dtypes)["timestamp"] == "timestamp"
    assert rows[0]["symbol"] == "BTCUSDT"


def test_klines_to_df_empty_and_junk(spark):
    df = providers.klines_to_df(spark, [], providers.BYBIT_COLS)
    assert df.count() == 0 and "close" in df.columns
    junk = [[1_700_000_000_000, "oops", "1", "1", "1", "1", "1"]]
    got = providers.klines_to_df(spark, junk, providers.BYBIT_COLS).first()
    assert got["open"] is None  # pandas-coerce parity: junk → null


def test_with_retry_and_rate_limiter():
    attempts = []

    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise ValueError("boom")
        return "ok"

    slept = []
    assert (
        providers.with_retry(flaky, retries=3, backoff_s=1.0, sleep=slept.append)
        == "ok"
    )
    assert slept == [1.0, 2.0]
    with pytest.raises(ValueError):
        providers.with_retry(
            lambda: (_ for _ in ()).throw(ValueError("x")),
            retries=1,
            sleep=lambda _: None,
        )

    clock = iter([0.0, 0.0, 0.3, 0.3, 5.0, 5.0]).__next__
    waits = []
    rl = providers.RateLimiter(1.0, clock=clock, sleep=waits.append)
    rl.wait("ep")
    rl.wait("ep")  # 0.3s since last → sleep 0.7
    rl.wait("ep")  # 5.0s since last → no sleep
    assert waits == pytest.approx([0.7])


class _FakeResp:
    def __init__(self, status=200, payload=None, headers=None):
        self.status_code = status
        self.headers = headers or {}
        self._payload = payload

    def json(self):
        return self._payload

    def raise_for_status(self):
        if self.status_code >= 400:
            raise IOError(f"HTTP {self.status_code}")


def test_fetch_with_rate_limit_honors_retry_after():
    """429 pacing: the server's Retry-After header wins over the
    exponential schedule; without the header the delay doubles per
    attempt (reference get_data_with_rate_limit semantics)."""
    responses = iter(
        [
            _FakeResp(429, headers={"Retry-After": "7"}),
            _FakeResp(429),  # no header → exp backoff at attempt index 1
            _FakeResp(200, payload={"rows": [1, 2]}),
        ]
    )
    slept = []
    out = providers.fetch_with_rate_limit(
        lambda url: next(responses),
        "https://x/klines",
        rate_limit_delay=1.0,
        sleep=slept.append,
    )
    assert out == {"rows": [1, 2]}
    assert slept == [7.0, 2.0]  # header-driven, then 1.0 * 2**1

    # all attempts rate-limited → None (exhausted contract)
    slept2 = []
    out2 = providers.fetch_with_rate_limit(
        lambda url: _FakeResp(429),
        "https://x/klines",
        rate_limit_delay=1.0,
        max_attempts=3,
        sleep=slept2.append,
    )
    assert out2 is None
    assert slept2 == [1.0, 2.0, 4.0]

    # transport error: flat-delay retries, re-raised on final attempt
    with pytest.raises(IOError):
        providers.fetch_with_rate_limit(
            lambda url: (_ for _ in ()).throw(IOError("conn reset")),
            "https://x/klines",
            max_attempts=2,
            sleep=lambda _: None,
        )
    # non-429 error status raises via raise_for_status
    with pytest.raises(IOError, match="HTTP 503"):
        providers.fetch_with_rate_limit(
            lambda url: _FakeResp(503), "https://x/klines"
        )


def test_fetch_with_rate_limit_date_retry_after_and_pacing():
    """RFC 7231 allows an HTTP-date Retry-After: the non-numeric form
    must fall back to the exponential schedule, not raise out of the
    retry loop; and the limiter paces EVERY attempt, not only the
    first."""
    responses = iter(
        [
            _FakeResp(
                429, headers={"Retry-After": "Wed, 21 Oct 2015 07:28:00 GMT"}
            ),
            _FakeResp(200, payload={"ok": 1}),
        ]
    )
    slept = []
    waited = []

    class _Limiter:
        def wait(self, url):
            waited.append(url)

    out = providers.fetch_with_rate_limit(
        lambda url: next(responses),
        "https://x/klines",
        rate_limit_delay=1.0,
        limiter=_Limiter(),
        sleep=slept.append,
    )
    assert out == {"ok": 1}
    assert slept == [1.0]  # date form → 1.0 * 2**0 exponential fallback
    assert waited == ["https://x/klines"] * 2  # one wait per attempt


def test_fetch_with_rate_limit_clamps_out_of_range_retry_after():
    """A numeric-but-hostile Retry-After must not escape the retry
    loop: a negative value would make time.sleep raise ValueError, a
    huge one would stall the client unboundedly — both fall back to
    the exponential schedule; an in-range value still wins."""
    responses = iter(
        [
            _FakeResp(429, headers={"Retry-After": "-5"}),
            _FakeResp(429, headers={"Retry-After": "999999"}),
            _FakeResp(429, headers={"Retry-After": "3"}),
            _FakeResp(200, payload={"ok": 1}),
        ]
    )
    slept = []
    out = providers.fetch_with_rate_limit(
        lambda url: next(responses),
        "https://x/klines",
        rate_limit_delay=1.0,
        sleep=slept.append,
        retry_after_cap=120.0,
    )
    assert out == {"ok": 1}
    # -5 → 1.0*2**0, 999999 → 1.0*2**1, 3 (in range) → honored
    assert slept == [1.0, 2.0, 3.0]


def test_fetch_with_timeout_normalizes():
    def slow_get(url, timeout=None):
        raise TimeoutError("socket timed out")

    with pytest.raises(TimeoutError, match="timed out after 2.5s"):
        providers.fetch_with_timeout(slow_get, "https://x/y", timeout=2.5)

    got = providers.fetch_with_timeout(
        lambda url, timeout=None: _FakeResp(200, payload={"ok": timeout}),
        "https://x/y",
        timeout=9.0,
    )
    assert got == {"ok": 9.0}


def test_cached_fetcher_freshness_and_stale_recovery(tmp_path):
    """The S19 cache half: fresh hits skip the network, expiry
    refetches + write-through, a DEAD fetch falls back to the stale
    entry, corrupt cache is treated as absent."""
    now = [1000.0]
    cf = providers.CachedFetcher(
        str(tmp_path / "cache"), max_age_s=100.0, clock=lambda: now[0]
    )
    calls = []

    def fetch_ok():
        calls.append(1)
        return {"page": len(calls)}

    # miss → fetch + cache; fresh hit → no new fetch
    assert cf.get("BTC-1h", fetch_ok) == {"page": 1}
    assert cf.get("BTC-1h", fetch_ok) == {"page": 1}
    assert len(calls) == 1

    # expire the entry (mtime is real; age via injected clock needs the
    # stat mtime — so push the clock past the window by backdating)
    import os

    path = cf._path("BTC-1h")
    os.utime(path, (os.stat(path).st_atime, now[0] - 101.0))
    assert cf.get("BTC-1h", fetch_ok) == {"page": 2}
    assert len(calls) == 2

    # flaky API: expired cache + failing fetch → stale data returned
    os.utime(path, (os.stat(path).st_atime, now[0] - 101.0))

    def fetch_dead():
        raise IOError("api down")

    assert cf.get("BTC-1h", fetch_dead) == {"page": 2}

    # no cache at all → the fetch error surfaces
    with pytest.raises(IOError, match="api down"):
        cf.get("ETH-1h", fetch_dead)

    # corrupt cache: treated as absent on read, refetched
    with open(path, "w") as f:
        f.write("{not json")
    assert cf.get("BTC-1h", fetch_ok) == {"page": 3}
    # ...and a corrupt cache with a dead fetch surfaces the FETCH error
    with open(path, "w") as f:
        f.write("{not json")
    os.utime(path, (os.stat(path).st_atime, now[0] - 101.0))
    with pytest.raises(IOError, match="api down"):
        cf.get("BTC-1h", fetch_dead)


def test_cached_fetcher_guards_flaky_harvest(spark):
    """E2E shape: a paginated harvest whose fetch dies mid-run still
    lands a typed frame from cached pages (stale recovery feeding
    klines_to_df — the reference's long-harvest survival story)."""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        cf = providers.CachedFetcher(d, max_age_s=0.0)  # everything stale
        page = [[1704067200000, "42.0", "43.0", "41.0", "42.5", "100", "4250"]]
        # first harvest caches the page
        assert cf.get("p0", lambda: page) == page
        # second harvest: API down → stale page keeps the pipeline fed
        rows = cf.get("p0", lambda: (_ for _ in ()).throw(IOError("down")))
        df = providers.klines_to_df(spark, rows, providers.BYBIT_COLS, "BTCUSDT")
        assert df.count() == 1
        assert df.select("close").first()[0] == 42.5


# ---------------------------------------------------------------------------
# S16/S17 DDL builders + E3 read-side query
# ---------------------------------------------------------------------------


def test_ddl_statements():
    from financial_data_pipeline_spark.sources import ddl

    ht = ddl.ohlcv_hypertable_ddl()
    assert "create_hypertable('ohlcv_data'" in ht[1]
    assert any("compress_segmentby = 'symbol'" in s for s in ht)
    assert any("add_retention_policy" in s for s in ht)
    assert ddl.ohlcv_hypertable_ddl(retain_for=None)[-1].startswith(
        "SELECT add_compression_policy"
    )
    ca = ddl.continuous_aggregate_ddl()
    assert "timescaledb.continuous" in ca[0]
    assert "time_bucket(INTERVAL '1 hour'" in ca[0]
    md = ddl.metadata_tables_ddl()
    assert len(md) == 8 and "JSONB" in md[0]

    ran = []
    ddl.run_ddl("dsn", ht, executor=lambda dsn, stmts: ran.extend(stmts))
    assert ran == ht


def test_query_ohlcv_is_topk(spark, ohlcv_df):
    from financial_data_pipeline_spark.operators.stats import query_ohlcv

    out = query_ohlcv(
        ohlcv_df, symbol="BTCUSDT", start="2025-01-02", limit=10
    )
    rows = out.collect()
    assert len(rows) == 10
    ts = [r["timestamp"] for r in rows]
    assert ts == sorted(ts, reverse=True)
    assert all(r["symbol"] == "BTCUSDT" for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort


# ---------------------------------------------------------------------------
# Archive maintenance: retention + compaction
# ---------------------------------------------------------------------------


def test_archive_retention_drops_old_partitions(spark, tmp_path):
    from financial_data_pipeline_spark.sources import maintenance

    df = synthetic.synthetic_ohlcv(
        spark, ["BTCUSDT", "ETHUSDT"], "2025-01-15", "2025-04-15", 360, seed=4
    )
    root = str(tmp_path / "arch_ret")
    sinks.write_archive(df, root)
    before = maintenance.list_month_partitions(spark, root)
    assert [(p.year, p.month) for p in before] == [
        (2025, 1), (2025, 2), (2025, 3), (2025, 4)
    ]

    deleted = maintenance.apply_retention(spark, root, 2025, 3)
    assert len(deleted) == 2  # Jan + Feb dropped
    after = maintenance.list_month_partitions(spark, root)
    assert [(p.year, p.month) for p in after] == [(2025, 3), (2025, 4)]

    # manifest rewritten to match the surviving partitions
    manifest = spark.read.parquet(f"{root}/_manifest")
    assert manifest.filter(F.col("month") < 3).count() == 0
    assert manifest.count() == 2 * 2  # Mar, Apr × 2 symbols

    # surviving data still reads correctly (pruned scan)
    got = read_archive(spark, root, symbol="BTCUSDT", start="2025-03-01",
                       end="2025-04-30")
    expect = df.filter(
        (F.col("symbol") == "BTCUSDT")
        & F.col("timestamp").between("2025-03-01", "2025-04-30")
    )
    assert got.count() == expect.count()


def test_archive_compaction_merges_small_files(spark, tmp_path):
    from financial_data_pipeline_spark.sources import maintenance

    root = str(tmp_path / "arch_cmp")
    df = synthetic.synthetic_ohlcv(
        spark, ["BTCUSDT"], "2025-01-01", "2025-01-20", 60, seed=5
    )
    # five appends = five small files per leaf partition
    for i in range(5):
        sinks.write_archive(df, root)
    leaf_before = maintenance._leaf_partitions(spark, root)
    assert all(p.n_files >= 5 for p in leaf_before)
    total_before = spark.read.parquet(root).count()

    results = maintenance.compact_archive(spark, root, min_files=1)
    assert results  # something was compacted
    for before_n, after_n in results.values():
        assert after_n < before_n

    # row-level content unchanged; partition columns still directory-encoded
    compacted = spark.read.parquet(root)
    assert compacted.count() == total_before
    assert {"year", "month", "symbol"} <= set(compacted.columns)
    one = (
        compacted.filter(F.col("timestamp") == df.first()["timestamp"])
        .groupBy("timestamp")
        .count()
        .first()
    )
    assert one["count"] == 5  # the 5 duplicate appends survive compaction


def test_archive_sorted_write_clusters_row_groups(spark, tmp_path):
    """sort_by_time gives every output file ascending-timestamp row
    groups, so min/max stats are non-overlapping and a timestamp
    predicate can skip whole row groups (lake-side time index)."""
    import glob

    import pyarrow.parquet as pq

    df = synthetic.synthetic_ohlcv(
        spark, ["BTCUSDT"], "2025-01-01", "2025-02-28", 5, seed=7
    ).repartition(3)  # scramble row order so the sort has work to do
    root = str(tmp_path / "arch_sorted")
    # tiny row groups so even sf-test data produces several per file
    sinks.write_archive(
        df, root, writer_options={"parquet.block.size": "16384"}
    )

    files = glob.glob(f"{root}/year=*/month=*/symbol=*/part-*.parquet")
    assert files
    multi_rg = 0
    for path in files:
        meta = pq.ParquetFile(path).metadata
        ts_idx = [
            i
            for i in range(meta.num_columns)
            if meta.row_group(0).column(i).path_in_schema == "timestamp"
        ][0]
        bounds = [
            (
                meta.row_group(g).column(ts_idx).statistics.min,
                meta.row_group(g).column(ts_idx).statistics.max,
            )
            for g in range(meta.num_row_groups)
        ]
        if len(bounds) > 1:
            multi_rg += 1
        for (lo, hi), (lo2, _) in zip(bounds, bounds[1:]):
            assert lo <= hi <= lo2  # sorted, non-overlapping ranges
    assert multi_rg  # the assertion above actually bit on something

    # narrow time-range read still returns exactly the right rows
    got = read_archive(
        spark, root, symbol="BTCUSDT", start="2025-01-10", end="2025-01-11"
    )
    expect = df.filter(
        F.col("timestamp").between("2025-01-10", "2025-01-11")
    )
    assert got.count() == expect.count()

    # and the scan PROVABLY skipped row groups: its numOutputRows metric
    # counts rows in non-skipped groups only, a small fraction of total
    total = spark.read.parquet(root).count()
    narrow = spark.read.parquet(root).filter(
        F.col("timestamp").between("2025-01-10", "2025-01-11")
    )
    n_filtered = len(narrow.collect())
    scans = []

    def walk(node):
        if "Scan" in node.nodeName():
            m = node.metrics()
            it = m.keysIterator()
            while it.hasNext():
                k = it.next()
                if k == "numOutputRows":
                    scans.append(m.apply(k).value())
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(narrow._jdf.queryExecution().executedPlan())
    assert scans and n_filtered <= scans[0] < total / 4


def test_refresh_aggregate_swaps_only_touched_partitions(spark, tmp_path):
    """Batch continuous-aggregate refresh: late data in one month
    triggers a window refresh that rewrites ONLY that month's
    partitions of the aggregate table (dynamic partition overwrite);
    untouched months keep their exact files, and the refreshed table
    equals a full recompute."""
    import glob as globmod

    from financial_data_pipeline_spark.operators import resample
    from financial_data_pipeline_spark.operators.refresh import (
        refresh_aggregate,
    )

    arch = str(tmp_path / "arch")
    agg = str(tmp_path / "agg")
    df = synthetic.synthetic_ohlcv(
        spark, ["BTCUSDT", "ETHUSDT"], "2025-01-01", "2025-03-31", 60, seed=9
    )
    sinks.write_archive(df, arch)
    refresh_aggregate(spark, arch, agg, "4h")  # initial materialization
    jan_before = sorted(globmod.glob(f"{agg}/year=2025/month=1/*.parquet"))
    assert jan_before

    # late bars land in February only → refresh just that window
    late = synthetic.synthetic_ohlcv(
        spark, ["BTCUSDT"], "2025-02-10", "2025-02-12", 60, seed=10
    )
    sinks.write_archive(late, arch)
    refresh_aggregate(
        spark, arch, agg, "4h",
        start="2025-02-01", end="2025-02-28 23:59:59",
    )

    # January's files are byte-identical — never rewritten
    assert sorted(globmod.glob(f"{agg}/year=2025/month=1/*.parquet")) == jan_before

    # refreshed aggregate == full recompute from the (new) archive
    got = spark.read.parquet(agg).drop("year", "month")
    expect = resample.resample_ohlcv(
        spark.read.parquet(arch).select(
            "timestamp", "symbol", "open", "high", "low", "close", "volume"
        ),
        "4h",
        fill_gaps=False,
    )
    key = ["symbol", "bucket_ts"]
    assert got.count() == expect.count()
    diff = (
        got.alias("g")
        .join(expect.alias("e"), key)
        .filter(
            (F.col("g.volume") != F.col("e.volume"))
            | (F.col("g.high") != F.col("e.high"))
        )
    )
    assert diff.count() == 0


def test_missing_partitions_backfill_plan(spark, tmp_path):
    """The backfill planner reports exactly the (symbol, year, month)
    partitions absent from the manifest for the requested window."""
    from financial_data_pipeline_spark.sources import maintenance

    root = str(tmp_path / "arch_bf")
    # archive holds Jan and Mar for BTC, Jan only for ETH — Feb is a hole
    for sym, months in [("BTCUSDT", ["2025-01", "2025-03"]),
                        ("ETHUSDT", ["2025-01"])]:
        for m in months:
            df = synthetic.synthetic_ohlcv(
                spark, [sym], f"{m}-05", f"{m}-10", 360, seed=11
            )
            sinks.write_archive(df, root)

    plan = maintenance.missing_partitions(
        spark, root, "2025-01-01", "2025-03-31"
    ).collect()
    got = {(r["symbol"], r["year"], r["month"]) for r in plan}
    assert got == {
        ("BTCUSDT", 2025, 2),
        ("ETHUSDT", 2025, 2),
        ("ETHUSDT", 2025, 3),
    }

    # explicit symbol list extends the expectation to unseen symbols
    plan2 = maintenance.missing_partitions(
        spark, root, "2025-01-01", "2025-01-31", symbols=["BTCUSDT", "XRPUSDT"]
    ).collect()
    got2 = {(r["symbol"], r["year"], r["month"]) for r in plan2}
    assert got2 == {("XRPUSDT", 2025, 1)}


def test_read_csv_quarantines_corrupt_rows(spark, tmp_path):
    """PERMISSIVE ingest: malformed lines null out and land in the
    quarantine column instead of failing the job (or being silently
    dropped); clean rows parse normally."""
    from pyspark.sql import types as T

    p = tmp_path / "in.csv"
    p.write_text(
        "timestamp,open,close\n"
        "2025-01-01T00:00:00,100.0,101.0\n"
        "2025-01-01T01:00:00,not_a_number,102.0\n"
        "2025-01-01T02:00:00,103.0,104.0\n"
    )
    schema = T.StructType(
        [
            T.StructField("timestamp", T.TimestampType()),
            T.StructField("open", T.DoubleType()),
            T.StructField("close", T.DoubleType()),
        ]
    )
    df = read_csv(spark, str(p), schema=schema, corrupt_col="_bad").cache()
    assert df.count() == 3  # nothing dropped
    bad = df.filter(F.col("_bad").isNotNull()).collect()
    assert len(bad) == 1
    assert "not_a_number" in bad[0]["_bad"]
    assert bad[0]["open"] is None  # coerced, pandas-errors="coerce" parity
    clean = df.filter(F.col("_bad").isNull())
    assert clean.count() == 2
    assert {r["open"] for r in clean.collect()} == {100.0, 103.0}
    df.unpersist()


def test_read_archive_merge_schema_evolution(spark, tmp_path):
    """A column added later in the archive's life is visible with
    merge_schema=True (null-filled for history) and invisible on the
    default fast path that trusts the latest write's schema."""
    root = str(tmp_path / "arch_evo")
    old = synthetic.synthetic_ohlcv(
        spark, ["BTCUSDT"], "2025-01-05", "2025-01-08", 360, seed=12
    )
    sinks.write_archive(old, root)
    new = synthetic.synthetic_ohlcv(
        spark, ["BTCUSDT"], "2025-02-05", "2025-02-08", 360, seed=13
    ).withColumn("turnover", F.col("volume") * F.col("close"))
    sinks.write_archive(new, root)

    evolved = read_archive(spark, root, merge_schema=True)
    assert "turnover" in evolved.columns
    jan = evolved.filter(F.col("month") == 1)
    feb = evolved.filter(F.col("month") == 2)
    assert jan.filter(F.col("turnover").isNotNull()).count() == 0  # history null-filled
    assert feb.filter(F.col("turnover").isNull()).count() == 0


def test_read_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    from pyspark.sql import types as T

    from financial_data_pipeline_spark.sources.readers import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha"}\n'
        'not json at all\n'
        '{"doc_id": 2, "text": "beta"}\n'
        '{"doc_id": "oops", "text": 3}\n'
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = read_jsonl(spark, str(p), schema, corrupt_col="_bad").cache()
    clean = df.filter("_bad IS NULL")
    bad = df.filter("_bad IS NOT NULL")
    assert {(r.doc_id, r.text) for r in clean.collect()} == {
        (1, "alpha"), (2, "beta")
    }
    assert bad.count() == 2
    raws = {r._bad for r in bad.collect()}
    assert "not json at all" in raws


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    from financial_data_pipeline_spark.sources.readers import read_orc
    from financial_data_pipeline_spark.sources.sinks import write_orc

    df = spark.range(100).selectExpr("id", "id * 1.5 AS v")
    p = str(tmp_path / "orc")
    write_orc(df, p)
    back = read_orc(spark, p)
    assert back.count() == 100
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    plan = back.filter("id > 90")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "id" in plan
