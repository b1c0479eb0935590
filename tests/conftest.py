import numpy as np
import pandas as pd
import pytest

from financial_data_pipeline_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fdp-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def ohlcv_pdf():
    """Reference-style fixture: seeded 1-min OHLCV over 2025-01-01..10
    for two symbols (``tests/units/test_processing.py:14-25`` shape)."""
    rng = np.random.default_rng(42)
    frames = []
    for sym in ["BTCUSDT", "ETHUSDT"]:
        idx = pd.date_range("2025-01-01", "2025-01-03", freq="1min")
        n = len(idx)
        frames.append(
            pd.DataFrame(
                {
                    "timestamp": idx,
                    "symbol": sym,
                    "open": rng.uniform(30000, 31000, n),
                    "high": rng.uniform(31000, 32000, n),
                    "low": rng.uniform(29000, 30000, n),
                    "close": rng.uniform(30000, 31000, n),
                    "volume": rng.uniform(1, 100, n),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


@pytest.fixture(scope="session")
def ohlcv_df(spark, ohlcv_pdf):
    return spark.createDataFrame(ohlcv_pdf)


@pytest.fixture(scope="session")
def dirty_pdf(ohlcv_pdf):
    """FIXTURES.md T3: inject duplicates, nulls, negatives, OHLC
    violations, zero prices/volumes into the clean fixture."""
    pdf = ohlcv_pdf.copy()
    rng = np.random.default_rng(7)
    # duplicates (same ts, same symbol)
    dups = pdf.sample(50, random_state=1)
    pdf = pd.concat([pdf, dups], ignore_index=True)
    # nulls
    for col in ["open", "close", "volume"]:
        pdf.loc[pdf.sample(30, random_state=2).index, col] = np.nan
    # negatives
    pdf.loc[pdf.sample(20, random_state=3).index, "volume"] = -5.0
    # OHLC violations: high below low
    bad = pdf.sample(25, random_state=4).index
    pdf.loc[bad, "high"] = pdf.loc[bad, "low"] - 100.0
    # zero prices / volume
    pdf.loc[pdf.sample(10, random_state=5).index, "close"] = 0.0
    pdf.loc[pdf.sample(15, random_state=6).index, "volume"] = 0.0
    return pdf.sample(frac=1.0, random_state=8).reset_index(drop=True)
