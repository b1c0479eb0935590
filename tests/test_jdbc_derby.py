"""Real end-to-end JDBC coverage (S12/S13/S14/S15, J2/J3) against
embedded Apache Derby — the JDBC database that ships on Spark's own
classpath — so the append / scan / staged-MERGE-upsert paths execute
for real instead of via injected fakes. The same code targets Postgres
by swapping the URL (plus its driver jar on the classpath)."""

import pytest
from py4j.protocol import Py4JJavaError

from financial_data_pipeline_spark.sources.readers import read_jdbc
from financial_data_pipeline_spark.sources.sinks import (
    jdbc_execute,
    jdbc_staged_upsert,
    merge_upsert_sql,
    write_jdbc_append,
)


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    url = f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/db;create=true"
    jdbc_execute(
        spark,
        url,
        [
            # Derby uppercases unquoted identifiers while Spark quotes
            # DataFrame column names verbatim -- uppercase everywhere so
            # DDL, Spark writes, and MERGE all name the same columns
            # (CLOSE is also a Derby reserved word -> PX)
            "CREATE TABLE ohlcv (SYMBOL VARCHAR(32) NOT NULL,"
            " TS BIGINT NOT NULL, PX DOUBLE, VOL DOUBLE,"
            " PRIMARY KEY (SYMBOL, TS))"
        ],
    )
    return url


def _rows(spark, data):
    return spark.createDataFrame(
        data, "SYMBOL string, TS long, PX double, VOL double"
    )


def test_append_and_scan_roundtrip(spark, derby_url):
    df = _rows(spark, [("BTC", 1, 10.0, 1.0), ("BTC", 2, 11.0, 2.0), ("ETH", 1, 5.0, 3.0)])
    write_jdbc_append(df, derby_url, "ohlcv")
    back = read_jdbc(spark, derby_url, "ohlcv")
    assert back.count() == 3
    # predicate reaches the scan as a pushed filter
    btc = read_jdbc(spark, derby_url, "ohlcv", predicates=["SYMBOL = 'BTC'"])
    assert btc.count() == 2
    plan = btc._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "SYMBOL" in plan


def test_primary_key_is_real(spark, derby_url):
    dup = _rows(spark, [("BTC", 1, 99.0, 9.0)])
    with pytest.raises(Py4JJavaError):
        write_jdbc_append(dup, derby_url, "ohlcv")


def test_staged_merge_upsert_updates_and_inserts(spark, derby_url):
    batch = _rows(
        spark,
        [
            ("BTC", 2, 111.0, 22.0),  # existing key -> update
            ("ETH", 2, 6.0, 4.0),  # new key -> insert
            ("ETH", 3, 7.0, 5.0),  # new key -> insert
        ],
    )
    jdbc_staged_upsert(
        batch,
        derby_url,
        "ohlcv",
        key_cols=["SYMBOL", "TS"],
        create_column_types="SYMBOL VARCHAR(32)",
    )
    got = {
        (r.SYMBOL, r.TS): (r.PX, r.VOL)
        for r in read_jdbc(spark, derby_url, "ohlcv").collect()
    }
    assert len(got) == 5
    assert got[("BTC", 2)] == (111.0, 22.0)  # updated
    assert got[("BTC", 1)] == (10.0, 1.0)  # untouched
    assert got[("ETH", 3)] == (7.0, 5.0)  # inserted
    # staging table was dropped
    with pytest.raises(Py4JJavaError):
        jdbc_execute(spark, derby_url, ["SELECT 1 FROM ohlcv_stg"])


def test_staged_merge_ignore_mode(spark, derby_url):
    batch = _rows(spark, [("BTC", 1, 0.0, 0.0), ("SOL", 1, 1.0, 1.0)])
    jdbc_staged_upsert(
        batch,
        derby_url,
        "ohlcv",
        key_cols=["SYMBOL", "TS"],
        on_conflict="ignore",
        create_column_types="SYMBOL VARCHAR(32)",
    )
    got = {
        (r.SYMBOL, r.TS): r.PX
        for r in read_jdbc(spark, derby_url, "ohlcv").collect()
    }
    assert got[("BTC", 1)] == 10.0  # conflict ignored, original kept
    assert got[("SOL", 1)] == 1.0  # new key inserted


def test_merge_sql_shape():
    sql = merge_upsert_sql("t", "s", ["k", "a", "b"], ["k"])
    assert sql == (
        "MERGE INTO t t USING s s ON t.k = s.k"
        " WHEN MATCHED THEN UPDATE SET t.a = s.a, t.b = s.b"
        " WHEN NOT MATCHED THEN INSERT (k, a, b) VALUES (s.k, s.a, s.b)"
    )
    assert "WHEN MATCHED" not in merge_upsert_sql(
        "t", "s", ["k", "a"], ["k"], on_conflict="ignore"
    )


def test_run_ddl_via_jdbc_transport(spark, derby_url):
    from financial_data_pipeline_spark.sources.ddl import run_ddl

    run_ddl(
        derby_url,
        ["CREATE TABLE ddl_probe (ID BIGINT PRIMARY KEY, NOTE VARCHAR(64))"],
        spark=spark,
    )
    jdbc_execute(spark, derby_url, ["INSERT INTO ddl_probe VALUES (1, 'ok')"])
    assert read_jdbc(spark, derby_url, "ddl_probe").count() == 1


def test_streaming_upsert_drains_and_replays_idempotently(spark, derby_url, tmp_path):
    """File-drop stream -> foreachBatch staged MERGE into Derby: two
    drains with overlapping keys converge to last-write state, and
    re-running the drained query (no new files) changes nothing."""
    from financial_data_pipeline_spark.streaming.jdbc_sink import jdbc_upsert_writer

    jdbc_execute(
        spark,
        derby_url,
        [
            "CREATE TABLE bars_live (SYMBOL VARCHAR(32) NOT NULL,"
            " TS BIGINT NOT NULL, PX DOUBLE, VOL DOUBLE,"
            " PRIMARY KEY (SYMBOL, TS))"
        ],
    )
    src, ckpt = tmp_path / "src", str(tmp_path / "ckpt")
    _rows(spark, [("BTC", 1, 10.0, 1.0), ("BTC", 2, 11.0, 2.0)]).write.parquet(
        str(src / "b1")
    )

    def drain():
        stream = spark.readStream.schema(
            "SYMBOL string, TS long, PX double, VOL double"
        ).parquet(str(src / "*"))
        q = jdbc_upsert_writer(
            stream,
            derby_url,
            "bars_live",
            key_cols=["SYMBOL", "TS"],
            checkpoint=ckpt,
            create_column_types="SYMBOL VARCHAR(32)",
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    drain()
    got = {
        (r.SYMBOL, r.TS): r.PX
        for r in read_jdbc(spark, derby_url, "bars_live").collect()
    }
    assert got == {("BTC", 1): 10.0, ("BTC", 2): 11.0}

    # batch 2 revises (BTC, 2) and adds a key
    _rows(spark, [("BTC", 2, 99.0, 9.0), ("ETH", 1, 5.0, 5.0)]).write.parquet(
        str(src / "b2")
    )
    drain()
    got = {
        (r.SYMBOL, r.TS): r.PX
        for r in read_jdbc(spark, derby_url, "bars_live").collect()
    }
    assert got == {("BTC", 1): 10.0, ("BTC", 2): 99.0, ("ETH", 1): 5.0}

    # idempotent: a third drain with nothing new leaves state unchanged
    drain()
    again = {
        (r.SYMBOL, r.TS): r.PX
        for r in read_jdbc(spark, derby_url, "bars_live").collect()
    }
    assert again == got
