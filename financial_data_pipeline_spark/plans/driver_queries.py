"""Driver-contract query inventory (SURVEY.md §2 coverage).

Each entry pairs a Spark DataFrame plan (``QUERIES[name]``, callable
``(spark, sf_dir) -> DataFrame``) with a DuckDB oracle SQL twin
(``ORACLES[name]``) producing identical column names and values — the
driver's correctness gate compares row count + schema + order-
insensitive value hash at sf0.01.

Float policy: counts/keys/min/max are exact; sums/averages and anything
downstream of them are rounded to a fixed decimal in BOTH engines so
summation-order ULP noise can't break the hash (SURVEY.md §7.4 item 2).
Timestamps are emitted as epoch-microsecond BIGINTs (``unix_micros`` /
``epoch_us``) — exact, timezone-unambiguous, identical schema.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from financial_data_pipeline_spark.functions.timefeatures import day_of_week_pandas
from financial_data_pipeline_spark.operators import (
    cleaning,
    indicators,
    normalize,
    resample,
    stats,
)
from financial_data_pipeline_spark.sources.adapters import (
    events_as_ohlcv,
    events_as_ohlcv_sql,
    load_table,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

BARS_CTE = "WITH bars AS (" + events_as_ohlcv_sql(60).strip() + ")"


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _ts_us(col: str = "timestamp") -> F.Column:
    return F.unix_micros(F.col(col))


# ---------------------------------------------------------------------------
# Scans + flagship aggregation family (S8, A1, A3)
# ---------------------------------------------------------------------------


@query(
    "ohlcv_bars",
    BARS_CTE
    + """
SELECT symbol, epoch_us(timestamp) AS ts_us, open, high, low, close,
       round(volume, 6) AS volume
FROM bars
""",
)
def q_ohlcv_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-scan + A1-shaped bucket agg: events ticks → hourly OHLCV bars."""
    bars = events_as_ohlcv(spark, sf_dir)
    return bars.select(
        "symbol",
        _ts_us().alias("ts_us"),
        "open",
        "high",
        "low",
        "close",
        F.round("volume", 6).alias("volume"),
    )


@query(
    "symbol_stats",
    BARS_CTE
    + """
SELECT symbol,
       count(*) AS record_count,
       epoch_us(min(timestamp)) AS first_ts_us,
       epoch_us(max(timestamp)) AS last_ts_us,
       min(close) AS min_close,
       max(close) AS max_close,
       round(avg(close), 6) AS avg_close,
       round(sum(volume), 4) AS total_volume
FROM bars GROUP BY symbol
""",
)
def q_symbol_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 per-symbol summary (``timeseries_db.py:349-397``)."""
    bars = events_as_ohlcv(spark, sf_dir)
    return stats.symbol_stats(bars).select(
        "symbol",
        "record_count",
        F.unix_micros("first_timestamp").alias("first_ts_us"),
        F.unix_micros("last_timestamp").alias("last_ts_us"),
        "min_close",
        "max_close",
        F.round("avg_close", 6).alias("avg_close"),
        F.round("total_volume", 4).alias("total_volume"),
    )


@query(
    "resample_4h",
    BARS_CTE
    + """
SELECT symbol,
       epoch_us(make_timestamp((epoch_us(timestamp) // 14400000000) * 14400000000)) AS bucket_us,
       arg_min(open, epoch_us(timestamp)) AS open,
       max(high) AS high,
       min(low) AS low,
       arg_max(close, epoch_us(timestamp)) AS close,
       round(sum(volume), 4) AS volume
FROM bars GROUP BY 1, 2
""",
)
def q_resample_4h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: OHLCV re-aggregation 1h → 4h (no gap fill)."""
    bars = events_as_ohlcv(spark, sf_dir)
    out = resample.resample_ohlcv(bars, "4h", fill_gaps=False)
    return out.select(
        "symbol",
        F.unix_micros("bucket_ts").alias("bucket_us"),
        "open",
        "high",
        "low",
        "close",
        F.round("volume", 4).alias("volume"),
    )


@query(
    "resample_4h_filled",
    BARS_CTE
    + """
, agg AS (
  SELECT symbol,
         make_timestamp((epoch_us(timestamp) // 14400000000) * 14400000000) AS bucket_ts,
         arg_min(open, epoch_us(timestamp)) AS open,
         max(high) AS high,
         min(low) AS low,
         arg_max(close, epoch_us(timestamp)) AS close,
         sum(volume) AS volume
  FROM bars GROUP BY 1, 2
), cal AS (
  SELECT symbol, unnest(generate_series(lo, hi, INTERVAL 4 HOUR)) AS bucket_ts
  FROM (SELECT symbol, min(bucket_ts) AS lo, max(bucket_ts) AS hi FROM agg GROUP BY symbol)
), joined AS (
  SELECT cal.symbol, cal.bucket_ts, agg.open, agg.high, agg.low, agg.close,
         coalesce(agg.volume, 0.0) AS volume
  FROM cal LEFT JOIN agg ON cal.symbol = agg.symbol AND cal.bucket_ts = agg.bucket_ts
)
SELECT symbol, epoch_us(bucket_ts) AS bucket_us,
       last_value(open IGNORE NULLS) OVER w AS open,
       last_value(high IGNORE NULLS) OVER w AS high,
       last_value(low IGNORE NULLS) OVER w AS low,
       last_value(close IGNORE NULLS) OVER w AS close,
       round(volume, 4) AS volume
FROM joined
WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def q_resample_4h_filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + J4: resample WITH pandas empty-bucket semantics (calendar
    left-join + per-column ffill, volume→0)."""
    bars = events_as_ohlcv(spark, sf_dir)
    out = resample.resample_ohlcv(bars, "4h", fill_gaps=True)
    return out.select(
        "symbol",
        F.unix_micros("bucket_ts").alias("bucket_us"),
        "open",
        "high",
        "low",
        "close",
        F.round("volume", 4).alias("volume"),
    )


# ---------------------------------------------------------------------------
# Scalar functions / projections (F2, F3, P2)
# ---------------------------------------------------------------------------


@query(
    "time_features",
    """
SELECT event_id,
       epoch_us(ts) AS ts_us,
       hour(ts)::INT AS hour,
       (isodow(ts) - 1)::INT AS day_of_week,
       month(ts)::INT AS month,
       year(ts)::INT AS year
FROM events
""",
)
def q_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 time features with the pandas day-of-week encoding (Mon=0)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        _ts_us("ts").alias("ts_us"),
        F.hour("ts").cast("int").alias("hour"),
        day_of_week_pandas(F.col("ts")).alias("day_of_week"),
        F.month("ts").cast("int").alias("month"),
        F.year("ts").cast("int").alias("year"),
    )


# ---------------------------------------------------------------------------
# Dedup / imputation (P10, F4)
# ---------------------------------------------------------------------------


@query(
    "dedup_keep_first",
    """
SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
""",
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 deterministic keep-first dedup (vs nondeterministic
    ``dropDuplicates``): first event per (user, type) by (ts, event_id)."""
    ev = load_table(spark, sf_dir, "events")
    out = cleaning.dedup_keep_first(
        ev, keys=["user_id", "event_type"], order_by=["ts", "event_id"]
    )
    return out.select(
        "user_id", "event_type", "event_id", _ts_us("ts").alias("ts_us"), "value"
    )


@query(
    "ffill_impute",
    """
SELECT event_id,
       last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
FROM events
""",
)
def q_ffill_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 forward-fill: null out 'error' readings, ffill per user."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "value",
        F.when(F.col("event_type") != "error", F.col("value")),
    )
    out = cleaning.ffill(
        ev, ["value"], partition_by=["user_id"], order_by=["ts", "event_id"]
    )
    return out.select("event_id", F.col("value").alias("value_filled"))


# ---------------------------------------------------------------------------
# Outlier handling (F5/A6) + normalization (F10–F12)
# ---------------------------------------------------------------------------


@query(
    "iqr_clip",
    BARS_CTE
    + """
, q AS (
  SELECT symbol,
         quantile_cont(close, 0.25) AS q1,
         quantile_cont(close, 0.75) AS q3
  FROM bars GROUP BY symbol
)
SELECT b.symbol, epoch_us(b.timestamp) AS ts_us,
       round(greatest(q.q1 - 1.5 * (q.q3 - q.q1),
                      least(q.q3 + 1.5 * (q.q3 - q.q1), b.close)), 6) AS close_clipped
FROM bars b JOIN q USING (symbol)
""",
)
def q_iqr_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 IQR winsorization of close, per symbol (exact quantiles)."""
    bars = events_as_ohlcv(spark, sf_dir)
    out = cleaning.iqr_clip(bars, cols=["close"], factor=1.5)
    return out.select(
        "symbol",
        _ts_us().alias("ts_us"),
        F.round("close", 6).alias("close_clipped"),
    )


@query(
    "normalize_zscore",
    BARS_CTE
    + """
SELECT symbol, epoch_us(timestamp) AS ts_us,
       round((close - avg(close) OVER (PARTITION BY symbol))
             / stddev_samp(close) OVER (PARTITION BY symbol), 6) AS close_z,
       round((volume - min(volume) OVER (PARTITION BY symbol))
             / (max(volume) OVER (PARTITION BY symbol)
                - min(volume) OVER (PARTITION BY symbol)), 6) AS volume_mm,
       round(ln(1 + close), 6) AS close_log1p
FROM bars
""",
)
def q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10/F11/F12: z-score, min-max and log1p in one projection."""
    bars = events_as_ohlcv(spark, sf_dir)
    z = normalize.normalize(bars, ["close"], "zscore").select(
        "symbol", "timestamp", F.col("close").alias("close_z")
    )
    mm = normalize.normalize(bars, ["volume"], "minmax").select(
        "symbol", "timestamp", F.col("volume").alias("volume_mm")
    )
    lg = normalize.normalize(bars, ["close"], "log").select(
        "symbol", "timestamp", F.col("close").alias("close_log1p")
    )
    out = z.join(mm, ["symbol", "timestamp"]).join(lg, ["symbol", "timestamp"])
    return out.select(
        "symbol",
        _ts_us().alias("ts_us"),
        F.round("close_z", 6).alias("close_z"),
        F.round("volume_mm", 6).alias("volume_mm"),
        F.round("close_log1p", 6).alias("close_log1p"),
    )


# ---------------------------------------------------------------------------
# Validation counters / interval stats / quality (P11, A10, A11)
# ---------------------------------------------------------------------------


@query(
    "validation_counters",
    BARS_CTE
    + """
, iv AS (
  SELECT symbol, open, high, low, close, volume,
         (epoch_us(timestamp) - epoch_us(lag(timestamp) OVER w)) / 1000000.0 AS iv_s,
         abs(close / lag(close) OVER w - 1.0) AS chg
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY timestamp)
), med AS (
  SELECT symbol, quantile_cont(iv_s, 0.5) AS med_iv FROM iv GROUP BY symbol
)
SELECT iv.symbol,
       sum((iv.open = 0 OR iv.high = 0 OR iv.low = 0 OR iv.close = 0)::INT)::BIGINT AS zero_price_rows,
       sum((iv.volume = 0)::INT)::BIGINT AS zero_volume_rows,
       sum((iv.chg > 0.2)::INT)::BIGINT AS extreme_price_changes,
       sum((iv.iv_s > 6 * med.med_iv)::INT)::BIGINT AS time_gaps,
       count(*) AS valid_records
FROM iv JOIN med USING (symbol)
GROUP BY iv.symbol
""",
)
def q_validation_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 report counters as one aggregate pass per symbol."""
    bars = events_as_ohlcv(spark, sf_dir)
    return stats.zero_extreme_counts(bars, extreme_threshold=0.2)


@query(
    "interval_mode",
    BARS_CTE
    + """
, iv AS (
  SELECT symbol,
         (epoch_us(timestamp) - epoch_us(lag(timestamp)
            OVER (PARTITION BY symbol ORDER BY timestamp))) / 1000000.0 AS iv_s
  FROM bars
), mode AS (
  SELECT symbol, iv_s AS most_common_interval_seconds
  FROM (SELECT symbol, iv_s, count(*) AS n FROM iv WHERE iv_s IS NOT NULL GROUP BY 1, 2)
  QUALIFY row_number() OVER (PARTITION BY symbol ORDER BY n DESC, iv_s ASC) = 1
)
SELECT iv.symbol, mode.most_common_interval_seconds,
       sum((iv.iv_s != mode.most_common_interval_seconds)::INT)::BIGINT AS irregular_intervals
FROM iv JOIN mode USING (symbol)
WHERE iv.iv_s IS NOT NULL
GROUP BY 1, 2
""",
)
def q_interval_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 interval mode + irregular count per symbol."""
    bars = events_as_ohlcv(spark, sf_dir)
    return stats.interval_mode(bars)


@query(
    "quality_score",
    BARS_CTE
    + """
, iv AS (
  SELECT *, (epoch_us(timestamp) - epoch_us(lag(timestamp)
     OVER (PARTITION BY symbol ORDER BY timestamp))) / 1000000.0 AS iv_s
  FROM bars
)
SELECT symbol,
       round(1.0 - (sum((open IS NULL)::INT) + sum((high IS NULL)::INT) + sum((low IS NULL)::INT)
              + sum((close IS NULL)::INT) + sum((volume IS NULL)::INT)) / (count(*) * 5.0), 6) AS completeness,
       round(avg((high >= low AND open >= low AND open <= high AND close >= low AND close <= high)::INT), 6) AS ohlc_valid,
       round(sum((iv_s <= 3600)::INT) / count(*)::DOUBLE, 6) AS temporal_continuity,
       round(avg((volume > 0)::INT), 6) AS volume_valid,
       round((1.0 - (sum((open IS NULL)::INT) + sum((high IS NULL)::INT) + sum((low IS NULL)::INT)
              + sum((close IS NULL)::INT) + sum((volume IS NULL)::INT)) / (count(*) * 5.0)) * 0.3
             + avg((high >= low AND open >= low AND open <= high AND close >= low AND close <= high)::INT) * 0.3
             + (sum((iv_s <= 3600)::INT) / count(*)::DOUBLE) * 0.2
             + avg((volume > 0)::INT) * 0.2, 6) AS quality_score
FROM iv GROUP BY symbol
""",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 weighted quality score (weights .3/.3/.2/.2,
    ``data_validator.py:135-186``)."""
    out = stats.quality_score(
        events_as_ohlcv(spark, sf_dir), expected_interval_seconds=3600
    )
    return out.select(
        "symbol",
        *[
            F.round(c, 6).alias(c)
            for c in [
                "completeness",
                "ohlc_valid",
                "temporal_continuity",
                "volume_valid",
                "quality_score",
            ]
        ],
    )
