"""Serving-sink DDL bootstrap (SURVEY.md §2.1 S16/S17).

The reference creates a TimescaleDB hypertable with index + compression
+ retention policies (``timeseries_db.py:138-203``,
``timescaledb_schema.sql:5-70``) and four metadata tables with JSONB
payloads (``metadata_db.py:46-151``). In the Spark engine the lake is
parquet and these DDLs matter only when TimescaleDB/Postgres is kept as
a serving sink — so they are pure statement builders (unit-testable,
no DB here) plus a gated executor that replays them over psycopg2 once
at bootstrap. Not Spark operators; run on the driver.
"""

from __future__ import annotations

from collections.abc import Callable


def ohlcv_hypertable_ddl(
    table: str = "ohlcv_data",
    chunk_interval: str = "7 days",
    compress_after: str = "90 days",
    retain_for: str | None = "1 year",
) -> list[str]:
    """S16: CREATE TABLE + hypertable + index + compression/retention
    policies (``timeseries_db.py:152-196``; ``timescaledb_schema.sql``
    intervals 7d/14d/1y — the code path uses 90d compression)."""
    stmts = [
        f"""CREATE TABLE IF NOT EXISTS {table} (
  timestamp TIMESTAMPTZ NOT NULL,
  symbol VARCHAR(20) NOT NULL,
  open FLOAT NOT NULL,
  high FLOAT NOT NULL,
  low FLOAT NOT NULL,
  close FLOAT NOT NULL,
  volume FLOAT NOT NULL,
  hour INT,
  day_of_week INT,
  month INT,
  year INT,
  created_at TIMESTAMPTZ DEFAULT NOW(),
  UNIQUE (timestamp, symbol)
)""",
        f"SELECT create_hypertable('{table}', 'timestamp', "
        f"chunk_time_interval => INTERVAL '{chunk_interval}', "
        "if_not_exists => TRUE)",
        f"CREATE INDEX IF NOT EXISTS idx_{table}_symbol_time "
        f"ON {table} (symbol, timestamp DESC)",
        f"ALTER TABLE {table} SET (timescaledb.compress, "
        "timescaledb.compress_segmentby = 'symbol')",
        f"SELECT add_compression_policy('{table}', "
        f"INTERVAL '{compress_after}', if_not_exists => TRUE)",
    ]
    if retain_for:
        stmts.append(
            f"SELECT add_retention_policy('{table}', "
            f"INTERVAL '{retain_for}', if_not_exists => TRUE)"
        )
    return stmts


def continuous_aggregate_ddl(
    source_table: str = "ohlcv_data",
    view: str = "ohlcv_1h",
    bucket: str = "1 hour",
    start_offset: str = "3 hours",
    end_offset: str = "1 hour",
    refresh_every: str = "1 hour",
) -> list[str]:
    """The continuous-aggregate twin of
    :mod:`financial_data_pipeline_spark.streaming.continuous_aggregate`
    (``timescaledb_schema.sql:43-66``) for a Timescale serving sink."""
    return [
        f"""CREATE MATERIALIZED VIEW IF NOT EXISTS {view}
WITH (timescaledb.continuous) AS
SELECT symbol,
       time_bucket(INTERVAL '{bucket}', timestamp) AS bucket,
       first(open, timestamp) AS open,
       max(high) AS high,
       min(low) AS low,
       last(close, timestamp) AS close,
       sum(volume) AS volume
FROM {source_table}
GROUP BY symbol, bucket""",
        f"SELECT add_continuous_aggregate_policy('{view}', "
        f"start_offset => INTERVAL '{start_offset}', "
        f"end_offset => INTERVAL '{end_offset}', "
        f"schedule_interval => INTERVAL '{refresh_every}')",
    ]


def metadata_tables_ddl() -> list[str]:
    """S17: the four metadata tables + indexes
    (``metadata_db.py:54-151``), JSONB payloads included."""
    return [
        """CREATE TABLE IF NOT EXISTS dataset_metadata (
  id SERIAL PRIMARY KEY,
  dataset_name VARCHAR(255) NOT NULL,
  provider VARCHAR(100),
  symbol VARCHAR(50),
  timeframe VARCHAR(20),
  start_date TIMESTAMPTZ,
  end_date TIMESTAMPTZ,
  num_records INTEGER,
  metadata JSONB,
  created_at TIMESTAMPTZ DEFAULT NOW(),
  UNIQUE (dataset_name, provider, symbol, timeframe)
)""",
        """CREATE TABLE IF NOT EXISTS validation_reports (
  id SERIAL PRIMARY KEY,
  dataset_id INTEGER REFERENCES dataset_metadata(id),
  report JSONB NOT NULL,
  is_valid BOOLEAN,
  created_at TIMESTAMPTZ DEFAULT NOW()
)""",
        """CREATE TABLE IF NOT EXISTS data_lineage (
  id SERIAL PRIMARY KEY,
  source_dataset_id INTEGER REFERENCES dataset_metadata(id),
  target_dataset_id INTEGER REFERENCES dataset_metadata(id),
  transformation VARCHAR(255),
  details JSONB,
  created_at TIMESTAMPTZ DEFAULT NOW()
)""",
        """CREATE TABLE IF NOT EXISTS data_quality_metrics (
  id SERIAL PRIMARY KEY,
  dataset_id INTEGER REFERENCES dataset_metadata(id),
  metric_name VARCHAR(100) NOT NULL,
  metric_value DOUBLE PRECISION,
  details JSONB,
  created_at TIMESTAMPTZ DEFAULT NOW()
)""",
        "CREATE INDEX IF NOT EXISTS idx_dm_symbol ON dataset_metadata (symbol)",
        "CREATE INDEX IF NOT EXISTS idx_vr_dataset ON validation_reports (dataset_id)",
        "CREATE INDEX IF NOT EXISTS idx_dl_target ON data_lineage (target_dataset_id)",
        "CREATE INDEX IF NOT EXISTS idx_dqm_dataset ON data_quality_metrics (dataset_id)",
    ]


def run_ddl(
    dsn: str,
    statements: list[str],
    executor: Callable[[str, list[str]], None] | None = None,
    spark=None,
) -> None:
    """Replay DDL once at bootstrap.

    Three transports, most-available first: an injected ``executor``;
    any JVM-classpath JDBC driver via ``sinks.jdbc_execute`` when the
    DSN is a ``jdbc:`` URL and a ``spark`` session is given (tested for
    real against embedded Derby); else psycopg2 for bare Postgres DSNs.
    """
    if executor is not None:
        executor(dsn, statements)
        return
    if spark is not None and dsn.startswith("jdbc:"):
        from financial_data_pipeline_spark.sources.sinks import jdbc_execute

        jdbc_execute(spark, dsn, statements)
        return
    try:
        import psycopg2
    except ImportError as exc:  # pragma: no cover - not installed here
        raise NotImplementedError(
            "run_ddl needs psycopg2; install it or inject `executor=`"
        ) from exc
    with psycopg2.connect(dsn) as conn:  # pragma: no cover
        with conn.cursor() as cur:
            for stmt in statements:
                cur.execute(stmt)
        conn.commit()
