"""Sinks (SURVEY.md §2.1 S6, S7, S9, S10, S12–S14).

File sinks are thin wrappers over the DataFrame writer (distributed,
partition-parallel). The partitioned archive writer (S10) replaces the
reference's manual ``archives/{year}/{month:02d}/{symbol}/`` directory
layout + whole-file zlib/lzma/bz2 compression
(``data_storage_manager.py:92-145``) with Hive-partitioned parquet and a
columnar codec — strictly better: partition pruning on read, min/max row
group skipping, splittable files.

JDBC upsert/ignore (S13/S14, ``timeseries_db.py:399-434``,
``postgresql_storage.py:88-154``) has no native Spark writer; it is a
``foreachPartition`` sink batching ``execute_values`` statements — one
round-trip per batch instead of the reference's one per ROW. Statement
builders are pure functions, unit-testable without a database; the
psycopg2 import is gated (not installed in this container).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# File sinks
# ---------------------------------------------------------------------------


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S6: CSV sink (header on, like the reference's ``to_csv``)."""
    df.write.option("header", True).mode(mode).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S9: JSON-lines sink; timestamps serialize ISO-8601 by default."""
    df.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame, path: str, codec: str = "snappy", mode: str = "overwrite"
) -> None:
    """S7: parquet sink with codec (config default "snappy",
    ``config_manager.py:62``; "gzip" per ``data_cleaner.py:750-754``)."""
    df.write.option("compression", codec).mode(mode).parquet(path)


def write_orc(
    df: DataFrame, path: str, codec: str = "zstd", mode: str = "overwrite"
) -> None:
    """ORC sink — the other columnar interchange format warehouses
    (Hive/Trino estates) expect; same predicate-pushdown/statistics
    story as parquet, native in Spark. Beyond-reference scope: the
    interchange matrix a drop-in engine needs."""
    df.write.option("compression", codec).mode(mode).orc(path)


# ---------------------------------------------------------------------------
# Partitioned archive (S10 writer; reader is readers.read_archive / S11)
# ---------------------------------------------------------------------------


def write_archive(
    df: DataFrame,
    root: str,
    codec: str = "zstd",
    mode: str = "append",
    ts: str = "timestamp",
    sort_by_time: bool = True,
    writer_options: dict[str, str] | None = None,
) -> DataFrame:
    """S10: Hive-partitioned archive writer + manifest.

    Layout ``root/year=YYYY/month=M/symbol=SYM/part-*.parquet`` — the
    Spark-native rendering of the reference's
    ``archives/{year}/{month:02d}/{symbol}/{sym}_{tf}_{yyyymm}.parquet``
    (``data_storage_manager.py:115``). Partition columns are derived
    from ``ts`` when absent. The reference's per-file checksum + row
    count metadata (``data_storage_manager.py:125-139``) becomes a
    manifest table at ``root/_manifest`` with per-partition row counts
    and value ranges; returns the manifest rows written.

    ``sort_by_time`` extends the dynamic-partition writer's required
    sort key (year, month, symbol) with ``ts``: the writer sorts each
    task's rows on the partition columns anyway, so appending the
    timestamp costs nothing extra and clusters every output file by
    time — parquet row-group min/max stats become tight,
    non-overlapping ranges, and timestamp-predicate scans skip whole
    row groups (the lake-side analog of the reference's
    ``(symbol, time DESC)`` index, ``timescaledb_schema.sql:24-27``).
    """
    out = df
    if "year" not in out.columns:
        out = out.withColumn("year", F.year(ts))
    if "month" not in out.columns:
        out = out.withColumn("month", F.month(ts))
    if sort_by_time:
        out = out.sortWithinPartitions("year", "month", "symbol", ts)
    writer = out.write.option("compression", codec)
    for k, v in (writer_options or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).partitionBy("year", "month", "symbol").parquet(root)
    manifest = out.groupBy("year", "month", "symbol").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(ts).alias("min_ts"),
        F.max(ts).alias("max_ts"),
        F.current_timestamp().alias("archived_at"),
    )
    manifest.write.mode("append").parquet(f"{root}/_manifest")
    return manifest


# ---------------------------------------------------------------------------
# JDBC sinks
# ---------------------------------------------------------------------------


def write_jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    batch_size: int = 10_000,
) -> None:
    """S12: plain JDBC append (the reference's batched
    ``to_sql(method="multi")`` path, ``timeseries_db.py:205-250``)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batch_size)
        .mode("append")
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def upsert_sql(table: str, cols: list[str], key_cols: list[str]) -> str:
    """S13 statement: INSERT … ON CONFLICT (keys) DO UPDATE SET non-keys.

    Mirrors ``timeseries_db.py:415-427`` but as ONE multi-row VALUES
    statement per batch (the reference issues it per row).
    """
    collist = ", ".join(cols)
    keylist = ", ".join(key_cols)
    sets = ", ".join(
        f"{c} = EXCLUDED.{c}" for c in cols if c not in key_cols
    )
    return (
        f"INSERT INTO {table} ({collist}) VALUES %s "
        f"ON CONFLICT ({keylist}) DO UPDATE SET {sets}"
    )


def insert_ignore_sql(table: str, cols: list[str], key_cols: list[str]) -> str:
    """S14 statement: INSERT … ON CONFLICT (keys) DO NOTHING
    (``postgresql_storage.py:131-137``)."""
    collist = ", ".join(cols)
    keylist = ", ".join(key_cols)
    return (
        f"INSERT INTO {table} ({collist}) VALUES %s "
        f"ON CONFLICT ({keylist}) DO NOTHING"
    )


def _default_executor(dsn: str, sql: str, rows: list[tuple], page_size: int):
    """Per-partition batch executor (psycopg2 ``execute_values``).

    Import is deferred and gated: psycopg2 is not in this container;
    tests inject a fake executor instead.
    """
    try:
        import psycopg2
        from psycopg2.extras import execute_values
    except ImportError as exc:  # pragma: no cover - not installed here
        raise NotImplementedError(
            "jdbc_upsert needs psycopg2 on the executors; install it or "
            "inject `executor=`"
        ) from exc
    with psycopg2.connect(dsn) as conn:  # pragma: no cover
        with conn.cursor() as cur:
            execute_values(cur, sql, rows, page_size=page_size)
        conn.commit()


def jdbc_upsert(
    df: DataFrame,
    dsn: str,
    table: str,
    key_cols: list[str],
    on_conflict: str = "update",
    batch_size: int = 1_000,
    executor: Callable | None = None,
) -> None:
    """S13/S14: distributed batched upsert via ``foreachPartition``.

    Each partition opens ONE connection and sends multi-row
    ``execute_values`` batches — O(n/batch) round-trips vs the
    reference's O(n) (``timeseries_db.py:411-429``, its biggest perf
    bug per SURVEY.md §4.1). Idempotent under Spark task retry: the
    statement is a keyed upsert either way. ``on_conflict``:
    "update" (S13) or "ignore" (S14).
    """
    cols = df.columns
    sql = (
        upsert_sql(table, cols, key_cols)
        if on_conflict == "update"
        else insert_ignore_sql(table, cols, key_cols)
    )
    run = executor or _default_executor

    def sink(rows_iter):
        buf: list[tuple] = []
        for row in rows_iter:
            buf.append(tuple(row))
            if len(buf) >= batch_size:
                run(dsn, sql, buf, batch_size)
                buf = []
        if buf:
            run(dsn, sql, buf, batch_size)

    df.foreachPartition(sink)


# ---------------------------------------------------------------------------
# Staged set-based upsert (ANSI MERGE) — the warehouse-native S13/S14 path
# ---------------------------------------------------------------------------


def merge_upsert_sql(
    table: str,
    staging: str,
    cols: list[str],
    key_cols: list[str],
    on_conflict: str = "update",
) -> str:
    """S13/S14 as ONE set-based ANSI ``MERGE`` statement (Derby /
    Oracle / SQL Server / DB2 syntax; Postgres ≥15 accepts it too).

    The reference's upsert is a Python loop issuing one
    ``INSERT … ON CONFLICT`` per row (``timeseries_db.py:411-429``);
    ``upsert_sql`` batches that to multi-row VALUES, and this is the
    endpoint of that progression: the whole batch joins against the
    target INSIDE the database — zero per-row round trips.
    """
    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    sets = ", ".join(f"t.{c} = s.{c}" for c in cols if c not in key_cols)
    collist = ", ".join(cols)
    vals = ", ".join(f"s.{c}" for c in cols)
    stmt = f"MERGE INTO {table} t USING {staging} s ON {on}"
    if on_conflict == "update" and sets:
        stmt += f" WHEN MATCHED THEN UPDATE SET {sets}"
    stmt += f" WHEN NOT MATCHED THEN INSERT ({collist}) VALUES ({vals})"
    return stmt


def jdbc_execute(spark, url: str, statements: list[str]) -> None:
    """Run DDL/DML statements over the JVM's ``java.sql.DriverManager``
    (driver-side, one connection) — no Python DB driver needed; any
    JDBC driver on the Spark classpath works (Derby ships with Spark,
    so the staged-upsert path is end-to-end testable in-process)."""
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            for sql in statements:
                st.execute(sql)
        finally:
            st.close()
    finally:
        conn.close()


def jdbc_staged_upsert(
    df: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    staging_table: str | None = None,
    on_conflict: str = "update",
    properties: dict[str, str] | None = None,
    create_column_types: str | None = None,
    drop_staging: bool = True,
) -> None:
    """Distributed staged upsert: the DATA path is a parallel Spark
    JDBC write into a staging table (every executor streams batches),
    then ONE set-based ``MERGE`` folds staging into the target — the
    standard warehouse upsert shape at any scale. Only the statement
    runs driver-side; no row ever passes through the driver.

    Staging is deduplicated on ``key_cols`` first (ANSI MERGE raises
    on a double-matched target row; the reference's row loop silently
    let the LAST duplicate win — with a lazy plan there is no "last",
    so the surviving duplicate is explicitly arbitrary-but-one).
    """
    staging = staging_table or f"{table}_stg"
    writer = (
        df.dropDuplicates(key_cols)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", staging)
        .mode("overwrite")
    )
    if create_column_types:
        writer = writer.option("createTableColumnTypes", create_column_types)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
    spark = df.sparkSession
    try:
        jdbc_execute(
            spark,
            url,
            [merge_upsert_sql(table, staging, df.columns, key_cols, on_conflict)],
        )
    finally:
        if drop_staging:
            jdbc_execute(spark, url, [f"DROP TABLE {staging}"])
