"""Canonical schemas (SURVEY.md §1.5).

The reference's one fundamental relation is the symbol-keyed UTC OHLCV
bar table (``data_cleaner.py:53-54`` required columns, widened with
``symbol`` + 4 derived time features by ``timeseries_db.py:23-35``).
Prices are float64 in the reference's compute path, so compute uses
``DoubleType`` for oracle parity; ``DecimalType(20,8)`` is reserved as a
JDBC-sink option only (``postgresql_storage.py:66-79``).
"""

from __future__ import annotations

from pyspark.sql import types as T

PRICE_COLUMNS = ["open", "high", "low", "close"]
OHLCV_COLUMNS = ["open", "high", "low", "close", "volume"]
REQUIRED_COLUMNS = ["timestamp", *OHLCV_COLUMNS]
TIME_FEATURE_COLUMNS = ["hour", "day_of_week", "month", "year"]

# Post-cleaning canonical table (FIXTURES.md T1).
OHLCV_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.DoubleType(), True),
        T.StructField("hour", T.IntegerType(), True),
        T.StructField("day_of_week", T.IntegerType(), True),
        T.StructField("month", T.IntegerType(), True),
        T.StructField("year", T.IntegerType(), True),
    ]
)

# Provider-raw shape: string-typed Bybit kline page
# (``bybit_downloader.py:126-141``; FIXTURES.md T2). Epoch-ms strings.
RAW_PROVIDER_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.StringType(), True),
        T.StructField("open", T.StringType(), True),
        T.StructField("high", T.StringType(), True),
        T.StructField("low", T.StringType(), True),
        T.StructField("close", T.StringType(), True),
        T.StructField("volume", T.StringType(), True),
        T.StructField("turnover", T.StringType(), True),
    ]
)

# Metadata dimension (``metadata_db.py:54-73``; FIXTURES.md T5).
DATASET_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("dataset_name", T.StringType(), False),
        T.StructField("provider", T.StringType(), True),
        T.StructField("symbol", T.StringType(), True),
        T.StructField("timeframe", T.StringType(), True),
        T.StructField("start_date", T.TimestampType(), True),
        T.StructField("end_date", T.TimestampType(), True),
        T.StructField("total_records", T.LongType(), True),
        T.StructField("file_path", T.StringType(), True),
        T.StructField("file_size_bytes", T.LongType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("metadata_json", T.StringType(), True),
    ]
)

DATA_LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("source_dataset_id", T.LongType(), False),
        T.StructField("target_dataset_id", T.LongType(), False),
        T.StructField("transformation_type", T.StringType(), True),
        T.StructField("transformation_details", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)
