"""Time / timestamp column functions (SURVEY.md F2, F3, F9).

Semantic traps pinned here (SURVEY.md §7.4 item 2):

- pandas ``dt.dayofweek`` is Monday=0..Sunday=6 while Spark
  ``dayofweek`` is Sunday=1..Saturday=7 — the reference uses the pandas
  encoding (``data_cleaner.py:289``), so ``day_of_week_pandas`` maps
  Spark's onto it. DuckDB oracle equivalent: ``isodow(ts) - 1``.
- epoch inputs are unit-configurable seconds/milliseconds
  (``data_cleaner.py:59,175-182``); strings coerce via cast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def day_of_week_pandas(ts: Column) -> Column:
    """Monday=0 .. Sunday=6 (pandas ``dt.dayofweek`` encoding)."""
    return ((F.dayofweek(ts) + 5) % 7).cast("int")


def epoch_to_timestamp(col: Column, unit: str = "s") -> Column:
    """Epoch seconds/milliseconds (numeric or numeric-string) → UTC timestamp.

    Mirrors ``pd.to_datetime(ts, unit=...)`` + UTC localize
    (``data_cleaner.py:175-189``); invalid values become null (coerce).
    """
    if unit == "s":
        return F.timestamp_seconds(col.cast("double"))
    if unit == "ms":
        return F.timestamp_millis(col.cast("double").cast("long"))
    raise ValueError(f"unsupported epoch unit: {unit!r} (use 's' or 'ms')")


def with_time_features(df: DataFrame, ts: str = "timestamp") -> DataFrame:
    """Add hour / day_of_week / month / year (``data_cleaner.py:287-292``)."""
    t = F.col(ts)
    return df.withColumns(
        {
            "hour": F.hour(t).cast("int"),
            "day_of_week": day_of_week_pandas(t),
            "month": F.month(t).cast("int"),
            "year": F.year(t).cast("int"),
        }
    )


def interval_seconds(ts: Column, prev_ts: Column) -> Column:
    """Seconds between consecutive timestamps (``timestamp.diff()``, F9).

    Computed on epoch-microseconds to keep sub-second inputs exact.
    """
    return (F.unix_micros(ts) - F.unix_micros(prev_ts)) / F.lit(1_000_000.0)
