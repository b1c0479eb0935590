"""SQL front door: the engine's surface as registered views.

Everything in this package is a lazy DataFrame plan, which means every
capability is equally reachable from ``spark.sql`` — a user who lives
in SQL (the reference's Postgres/Timescale audience,
``timescaledb_schema.sql``) gets the whole engine without touching the
Python API. :func:`register_views` publishes the testdata tables (via
``load_table`` so nanosecond-timestamp handling stays correct) plus the
derived bars view; any ANSI query over them compiles through the exact
same Catalyst pipeline as the DataFrame plans — same pushdown, same
broadcast decisions, same AQE.

On a real deployment these would be saveAsTable/catalog entries (Hive
metastore or Unity-style), not temp views; temp views are the
container-local stand-in with identical plan semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from financial_data_pipeline_spark.sources.adapters import (
    events_as_ohlcv,
    load_table,
)

BASE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def register_views(
    spark: SparkSession, sf_dir: str, bar_minutes: int = 60
) -> list[str]:
    """Publish the base tables + the derived ``ohlcv_bars`` view as
    temp views. Views are lazy — registering is free; cost is paid by
    the queries that scan them, with full pushdown into the parquet."""
    names = []
    for t in BASE_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)
    events_as_ohlcv(spark, sf_dir, bar_minutes).createOrReplaceTempView(
        "ohlcv_bars"
    )
    names.append("ohlcv_bars")
    return names


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Thin alias making the intent explicit at call sites: text SQL
    against the registered engine views."""
    return spark.sql(query)
