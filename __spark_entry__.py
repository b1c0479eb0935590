"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (SURVEY.md §7.2 minimum E2E
slice) at sf0.001; ``queries()`` / ``oracle_sql()`` expose the operator
inventory with DuckDB oracle twins (see
``financial_data_pipeline_spark/plans/driver_queries.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: events ticks → hourly
    OHLCV bars → validate/clean (repair mode) → per-symbol summary
    stats over cleaned 1h bars (SURVEY.md §7.2)."""
    from financial_data_pipeline_spark.operators import cleaning, stats
    from financial_data_pipeline_spark.sources.adapters import events_as_ohlcv

    bars = events_as_ohlcv(spark, "/root/testdata/sf0.001")
    cleaned = cleaning.clean_ohlcv(bars, mode="repair", price_tolerance=0.05)
    return stats.symbol_stats(cleaned)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from financial_data_pipeline_spark.plans.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from financial_data_pipeline_spark.plans.driver_queries import ORACLES

    return dict(ORACLES)
