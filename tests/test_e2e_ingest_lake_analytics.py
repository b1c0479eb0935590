"""Full-story integration: partition-parallel DataSource ingest →
versioned lake commit → indicator analytics, instrumented with
zero-extra-pass observed metrics.

This is the Spark-first rendering of the reference's whole pipeline
(download → store → process → analyze) in one test: every stage is a
lazy plan, the lake write is the only action, and the analytics read
back through snapshot isolation with file skipping.
"""

from pyspark.sql import functions as F

from financial_data_pipeline_spark.observability import PipelineMetrics
from financial_data_pipeline_spark.operators import indicators
from financial_data_pipeline_spark.sources.kline_datasource import (
    KlineDataSource,
)
from financial_data_pipeline_spark.sources.laketable import LakeTable


def test_ingest_commit_analyze_roundtrip(spark, tmp_path):
    spark.dataSource.register(KlineDataSource)
    pm = PipelineMetrics()

    # 1. ingest: two symbols, two days, pushdown-capable source
    raw = (
        spark.read.format("kline")
        .option("symbols", "BTCUSDT,ETHUSDT")
        .option("start", "2025-02-01")
        .option("end", "2025-02-03")
        .option("interval_minutes", "60")
        .load()
    )
    raw = pm.observe(raw, "ingested")

    # 2. lake commit (the ONE action so far; metrics ride it)
    table = LakeTable(spark, str(tmp_path / "bars"), stat_cols=["timestamp"])
    v1 = table.commit(raw, mode="append")
    assert v1 == 1
    assert pm.get("ingested")["rows"] == 2 * 2 * 24

    # 3. analytics on the committed snapshot: SMA(5) over closes
    bars = table.read(version=v1).withColumn(
        "sma_5", indicators.sma("close", 5)
    )
    got = bars.filter(F.col("sma_5").isNotNull()).count()
    # first 4 bars per symbol have no SMA(5)
    assert got == 2 * (48 - 4)

    # 4. second day's ingest lands as a new version; old snapshot stable
    more = (
        spark.read.format("kline")
        .option("symbols", "BTCUSDT,ETHUSDT")
        .option("start", "2025-02-03")
        .option("end", "2025-02-04")
        .option("interval_minutes", "60")
        .load()
    )
    v2 = table.commit(more, mode="append")
    assert table.read(version=v1).count() == 96
    assert table.read(version=v2).count() == 144

    # 5. time-range file skipping: day-3 query must not open v1's files
    files_day3 = table.pruned_files(
        pred_col="timestamp", lo="2025-02-03T00:00:00"
    )
    assert 0 < len(files_day3) < len(table.pruned_files())


def test_incremental_refresh_equals_full_recompute(spark, tmp_path):
    import datetime as dt

    from financial_data_pipeline_spark.operators.refresh import (
        incremental_window_refresh,
    )

    spark.dataSource.register(KlineDataSource)
    table = LakeTable(spark, str(tmp_path / "inc"), stat_cols=["timestamp"])

    def ingest(start, end):
        return (
            spark.read.format("kline")
            .option("symbols", "BTCUSDT,ETHUSDT")
            .option("start", start)
            .option("end", end)
            .option("interval_minutes", "60")
            .load()
        )

    table.commit(ingest("2025-03-01", "2025-03-02"))        # cold history
    v2 = table.commit(ingest("2025-03-02", "2025-03-03"))
    table.commit(ingest("2025-03-03", "2025-03-04"))        # the delta

    def compute(df):
        return df.withColumn("sma_5", indicators.sma("close", 5))

    incr = incremental_window_refresh(
        table,
        since_version=v2,
        compute=compute,
        lookback=dt.timedelta(hours=5),
    )
    full = compute(table.read()).filter(
        F.col("timestamp") >= "2025-03-03"
    )
    assert incr.count() == full.count() == 2 * 24
    assert (
        incr.select("symbol", "timestamp", "sma_5")
        .exceptAll(full.select("symbol", "timestamp", "sma_5"))
        .count()
        == 0
    )
    # delta-with-lookback read opens fewer files than the full table
    assert len(
        table.pruned_files(pred_col="timestamp", lo="2025-03-02T19:00:00")
    ) < len(table.pruned_files())


def test_incremental_refresh_none_when_no_delta(spark, tmp_path):
    import datetime as dt

    from financial_data_pipeline_spark.operators.refresh import (
        incremental_window_refresh,
    )

    spark.dataSource.register(KlineDataSource)
    table = LakeTable(spark, str(tmp_path / "inc2"), stat_cols=["timestamp"])
    v1 = table.commit(
        spark.read.format("kline")
        .option("symbols", "BTCUSDT")
        .option("start", "2025-03-01")
        .option("end", "2025-03-02")
        .load()
    )
    out = incremental_window_refresh(
        table, since_version=v1, compute=lambda d: d,
        lookback=dt.timedelta(hours=1),
    )
    assert out is None


def test_contract_gated_lake_ingest_with_dead_letter(spark, tmp_path):
    """The data-contract boundary: expectations gate rows at the lake
    edge — valid rows commit to the main table, violations land in a
    self-describing quarantine table, nothing is lost, and a rule fix
    lets the quarantine re-process into the main table."""
    import datetime as dt

    from financial_data_pipeline_spark.operators.expectations import (
        expect_between,
        expect_not_null,
        quarantine_split,
    )
    from financial_data_pipeline_spark.sources.laketable import LakeTable

    t0 = dt.datetime(2025, 1, 1)
    rows = [
        (1, t0, 10.0), (2, t0, None), (3, t0, -5.0), (4, t0, 20.0),
    ]
    batch = spark.createDataFrame(rows, "id long, ts timestamp, price double")
    exps = [expect_not_null("price"), expect_between("price", 0, 1e6)]
    valid, quar = quarantine_split(batch, exps)

    main = LakeTable(spark, str(tmp_path / "main"), stat_cols=["id"])
    dead = LakeTable(spark, str(tmp_path / "dead"), stat_cols=["id"])
    main.commit(valid)
    dead.commit(quar.withColumn("__violations",
                                F.to_json("__violations")))
    assert main.read().count() == 2
    q = dead.read()
    assert q.count() == 2
    # conservation: every input row landed exactly one side
    assert main.read().count() + q.count() == batch.count()

    # ops relaxes the range rule; re-process the quarantine
    relaxed = [expect_not_null("price")]
    requeued = q.drop("__violations")
    ok2, still_bad = quarantine_split(requeued, relaxed)
    main.merge(ok2, ["id"])
    assert {r.id for r in main.read().select("id").collect()} == {1, 3, 4}
    assert [r.id for r in still_bad.collect()] == [2]
