"""Python DataSource kline provider: partition fan-out, pushdown
pruning, determinism, typing, and the streaming cursor contract."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, In, LessThan

from financial_data_pipeline_spark.sources.kline_datasource import (
    KlineDataSource,
    KlineReader,
    KlineStreamReader,
)

OPTS = {
    "symbols": "BTCUSDT,ETHUSDT",
    "start": "2025-01-01",
    "end": "2025-01-03",
    "interval_minutes": "1",
    "page_rows": "1000",
}


@pytest.fixture(scope="module", autouse=True)
def register(spark):
    spark.dataSource.register(KlineDataSource)


def _load(spark):
    r = spark.read.format("kline")
    for k, v in OPTS.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_shape_and_invariants(spark):
    df = _load(spark)
    # 2 days × 1440 min × 2 symbols
    assert df.count() == 2 * 2 * 1440
    bad = df.filter(
        (F.col("high") < F.greatest("open", "close"))
        | (F.col("low") > F.least("open", "close"))
        | (F.col("close") <= 0)
        | (F.col("volume") <= 0)
    ).count()
    assert bad == 0
    assert dict(df.dtypes)["timestamp"] == "timestamp"


def test_batch_read_deterministic(spark):
    a = _load(spark).agg(F.sum("close"), F.count("*")).first()
    b = _load(spark).agg(F.sum("close"), F.count("*")).first()
    assert a == b


def test_partitions_fan_out_per_symbol_page():
    r = KlineReader(dict(OPTS))
    parts = r.partitions()
    # 2880 minutes / 1000-row pages = 3 pages per symbol × 2 symbols
    assert len(parts) == 6
    assert {p.symbol for p in parts} == {"BTCUSDT", "ETHUSDT"}


def test_pushdown_prunes_symbol_and_time_partitions():
    r = KlineReader(dict(OPTS))
    from datetime import datetime, timezone

    leftover = list(
        r.pushFilters(
            [
                EqualTo(("symbol",), "BTCUSDT"),
                GreaterThanOrEqual(
                    ("timestamp",),
                    datetime(2025, 1, 2, tzinfo=timezone.utc),
                ),
                EqualTo(("volume",), 3.0),  # not pushable
            ]
        )
    )
    assert leftover == [EqualTo(("volume",), 3.0)]
    parts = r.partitions()
    assert {p.symbol for p in parts} == {"BTCUSDT"}
    assert len(parts) < 3  # day-2 pages only


def test_pushed_filters_fully_honored(spark):
    df = _load(spark).filter(
        (F.col("symbol") == "BTCUSDT")
        & (F.col("timestamp") >= "2025-01-02")
    )
    assert df.select("symbol").distinct().collect()[0][0] == "BTCUSDT"
    assert df.count() == 1440
    assert df.agg(F.min("timestamp")).first()[0].day == 2


def test_pushdown_result_equals_unpushed(spark):
    full = _load(spark)
    pushed = full.filter(F.col("symbol").isin("ETHUSDT")).agg(
        F.sum("close").alias("s"), F.count("*").alias("n")
    ).first()
    manual = (
        full.withColumn("sym2", F.col("symbol"))
        .filter(F.col("sym2") == "ETHUSDT")  # survives pushdown (derived col)
        .agg(F.sum("close").alias("s"), F.count("*").alias("n"))
        .first()
    )
    assert pushed == manual


def test_stream_reader_cursor_contract():
    sr = KlineStreamReader(dict(OPTS))
    off0 = sr.initialOffset()
    rows1, off1 = sr.read(off0)
    rows1 = list(rows1)
    assert off1["cursor_ms"] > off0["cursor_ms"]
    assert len(rows1) == 2 * 1000  # one page per symbol
    # replay between offsets is identical (exactly-once contract)
    replay = list(sr.readBetweenOffsets(off0, off1))
    assert replay == rows1
    # drain to exhaustion: cursor stops advancing, batches go empty
    off = off1
    for _ in range(10):
        rows, nxt = sr.read(off)
        if nxt["cursor_ms"] == off["cursor_ms"]:
            assert list(rows) == []
            break
        off = nxt
    else:
        pytest.fail("stream cursor never exhausted")


def test_streaming_e2e_availablenow_resume_exactly_once(spark, tmp_path):
    """Real Structured Streaming runs: each availableNow run drains the
    next page(s) from the cursor via the checkpoint, and an exhausted
    source adds nothing — exactly-once across restarts."""
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def run_once():
        q = (
            spark.readStream.format("kline")
            .option("symbols", "BTCUSDT")
            .option("start", "2025-01-01")
            .option("end", "2025-01-02")
            .load()
        )
        sq = (
            q.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination(180)
        return spark.read.parquet(out).count()

    first = run_once()
    assert first == 1000  # one 1000-row page per micro-batch
    assert run_once() == 1440  # resumes at the cursor, drains the rest
    assert run_once() == 1440  # exhausted: no duplicates
