"""Technical indicators (SURVEY.md §2.5 W1–W10).

Re-expresses ``TechnicalIndicators``
(``src/data_etl/processing/technical_indicators.py``) as Spark window
expressions partitioned by ``symbol`` (the reference is single-series;
partitioning generalizes it). All rolling ops reproduce pandas
``rolling(n)`` default ``min_periods=n`` via a row-count mask (NaN/null
head), and ``rolling(...).std()`` is the SAMPLE stddev (ddof=1) →
``stddev_samp``.

EMA (``ewm(span, adjust=False)``) is a first-order recurrence with no
closed-form SQL window — custom component #4 (SURVEY.md §4.3): an
Arrow-batched grouped-map pandas UDF running the exact recurrence per
symbol. Scale note: one task per symbol; symbol-skew is the known risk
(SURVEY.md §7.4 item 1) — acceptable because EMA state is O(1), so a
chunked/streaming evaluation is the documented 100 TB path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _w(by: list[str], ts: str) -> Window:
    return Window.partitionBy(*by).orderBy(ts)


def _rolling(by: list[str], ts: str, n: int):
    return _w(by, ts).rowsBetween(-(n - 1), 0)


def sma(col: str | Column, n: int, by: list[str] = ("symbol",), ts: str = "timestamp") -> Column:
    """Simple moving average with pandas min_periods=n null head (W1)."""
    c = F.col(col) if isinstance(col, str) else col
    win = _rolling(list(by), ts, n)
    return F.when(F.count(c).over(win) >= n, F.avg(c).over(win))


def rolling_std(col: str | Column, n: int, by: list[str] = ("symbol",), ts: str = "timestamp") -> Column:
    """Rolling sample stddev (ddof=1, pandas default)."""
    c = F.col(col) if isinstance(col, str) else col
    win = _rolling(list(by), ts, n)
    return F.when(F.count(c).over(win) >= n, F.stddev_samp(c).over(win))


def lag_col(col: str | Column, by: list[str] = ("symbol",), ts: str = "timestamp", offset: int = 1) -> Column:
    """``shift()`` / ``diff()`` building block (W7)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lag(c, offset).over(_w(list(by), ts))


def pct_change(col: str | Column, by: list[str] = ("symbol",), ts: str = "timestamp") -> Column:
    """``Series.pct_change()`` (F8)."""
    c = F.col(col) if isinstance(col, str) else col
    return c / lag_col(c, by, ts) - 1.0


def rsi(col: str | Column, n: int = 14, by: list[str] = ("symbol",), ts: str = "timestamp") -> Column:
    """RSI over rolling-mean gains/losses (``technical_indicators.py:22-29``).

    gain = max(delta, 0), loss = max(-delta, 0) (the pandas
    ``delta.where(delta > 0, 0)`` form), both SMA(n); rs = gain/loss;
    rsi = 100 - 100/(1+rs). Parity subtlety: ``delta.where(delta > 0, 0)``
    maps the first row's NaN delta to **0** (NaN > 0 is False), so the
    null head is n−1 rows, not n — the unconditional ``otherwise(0)``
    below reproduces that.
    """
    c = F.col(col) if isinstance(col, str) else col
    delta = c - lag_col(c, by, ts)
    gain = F.when(delta > 0, delta).otherwise(F.lit(0.0))
    loss = F.when(delta < 0, -delta).otherwise(F.lit(0.0))
    win = _rolling(list(by), ts, n)
    avg_gain = F.when(F.count(gain).over(win) >= n, F.avg(gain).over(win))
    avg_loss = F.when(F.count(loss).over(win) >= n, F.avg(loss).over(win))
    rs = avg_gain / avg_loss
    # pandas edge parity: loss==0 & gain>0 → rs=inf → rsi=100;
    # loss==0 & gain==0 → 0/0=NaN → rsi NaN (null here).
    return F.when(
        (avg_loss == 0) & (avg_gain > 0), F.lit(100.0)
    ).when(
        (avg_loss == 0) & (avg_gain == 0), F.lit(None).cast("double")
    ).otherwise(100.0 - (100.0 / (1.0 + rs)))


def bollinger(
    col: str | Column, n: int = 20, num_std: float = 2.0,
    by: list[str] = ("symbol",), ts: str = "timestamp",
) -> dict[str, Column]:
    """Bollinger bands (``technical_indicators.py:49-59``)."""
    mid = sma(col, n, by, ts)
    sd = rolling_std(col, n, by, ts)
    return {
        "bb_middle": mid,
        "bb_upper": mid + sd * num_std,
        "bb_lower": mid - sd * num_std,
    }


def true_range(by: list[str] = ("symbol",), ts: str = "timestamp") -> Column:
    """TR = max(h−l, |h−prev_c|, |l−prev_c|) (``technical_indicators.py:61-71``).

    ``greatest`` skips nulls exactly like the pandas row-wise
    ``concat(axis=1).max(axis=1)`` skips NaN, so the first row falls
    back to high−low in both engines.
    """
    prev_c = lag_col("close", by, ts)
    return F.greatest(
        F.col("high") - F.col("low"),
        F.abs(F.col("high") - prev_c),
        F.abs(F.col("low") - prev_c),
    )


def atr(n: int = 14, by: list[str] = ("symbol",), ts: str = "timestamp") -> Column:
    """ATR = SMA(TR, n)."""
    tr = true_range(by, ts)
    win = _rolling(list(by), ts, n)
    return F.when(F.count(tr).over(win) >= n, F.avg(tr).over(win))


# ---------------------------------------------------------------------------
# EMA family — exact ewm(span, adjust=False) recurrence via grouped-map
# pandas UDF (W2, W4)
# ---------------------------------------------------------------------------


def with_ema(
    df: DataFrame,
    col: str = "close",
    spans: list[int] = (12, 26),
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
    out_prefix: str = "ema_",
) -> DataFrame:
    """Add ``{out_prefix}{span}`` EMA columns, exact pandas parity."""
    from pyspark.sql import types as T

    spans = list(spans)
    by = list(by)
    out_cols = [f"{out_prefix}{s}" for s in spans]
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(c, T.DoubleType(), True) for c in out_cols]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts)
        for s, out in zip(spans, out_cols):
            pdf[out] = pdf[col].ewm(span=s, adjust=False).mean()
        return pdf

    return df.groupBy(*by).applyInPandas(kernel, schema=schema)


def with_ema_chunked(
    df: DataFrame,
    col: str = "close",
    spans: list[int] = (12, 26),
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
    out_prefix: str = "ema_",
    chunk_rows: int = 65536,
    partitions: int | None = None,
) -> DataFrame:
    """EMA with NO one-giant-symbol task — the hot-key mitigation for
    :func:`with_ema` (risk register SURVEY.md §7.4 item 1; measured by
    ``tools/skew_probe.py`` under an 80%-hot symbol).

    ``with_ema`` streams each group through ONE Arrow task, so a hot
    symbol serializes 80% of the data into a single Python worker.
    Here each group is cut into fixed ``chunk_rows`` chunks by GLOBAL
    rank (``splitter.global_row_index`` — range partition + offsets,
    never a single-partition window), every chunk is shipped together
    with the previous W rows of its group as WARMUP (W = the
    ``ema_truncated`` ulp horizon per span: weights older than W rows
    are below one double ULP of the result), and each (group, chunk)
    runs the exact pandas recurrence in parallel; warmup rows are
    dropped after seeding. Chunks overlap-read ceil(W/chunk_rows)
    neighbors, so keep ``chunk_rows ≥ W`` (478 for span 26; the 65536
    default costs <1% duplication and, measured at a 5M-row hot
    symbol, matches the sequential kernel's wall clock while keeping
    every Arrow batch and task bounded — the actual 100 TB win is
    that no group ever has to FIT one Python worker).

    Accuracy contract = ``ema_truncated``'s: rows less than W into the
    stream are EXACT (they see their full true history); later rows
    agree with the sequential kernel to < 1e-12 relative. Timestamp
    ties within a group are ordered arbitrarily — the same contract as
    ``with_ema``'s pandas sort."""
    import math

    from pyspark.sql import types as T

    from financial_data_pipeline_spark.operators.splitter import (
        global_row_index,
    )

    spans = list(spans)
    by = list(by)
    out_cols = [f"{out_prefix}{s}" for s in spans]
    # span=1 means alpha = 2/(s+1) = 1: the EMA is the value itself, so
    # the warmup horizon is exactly one row — the general formula's
    # log(1-alpha) = log(0) would raise. Spans below 1 have alpha > 1
    # (log of a negative): not an EMA; reject rather than silently
    # producing a negative horizon (pandas ewm requires span >= 1 too).
    for s in spans:
        if s < 1:
            raise ValueError(f"EMA span must be >= 1, got {s!r}")
    W = max(
        1
        if s == 1
        else math.ceil(-53.0 * math.log(2.0) / math.log(1.0 - 2.0 / (s + 1.0)))
        for s in spans
    )
    in_cols = df.columns
    schema = T.StructType(
        [f for f in df.schema.fields]
        + [T.StructField(c, T.DoubleType(), True) for c in out_cols]
    )

    ranked, _ = global_row_index(df, [*by, ts], partitions)
    gmin = ranked.groupBy(*by).agg(F.min("__rn").alias("__rn0"))
    rn_in = F.col("__rn") - F.col("__rn0")  # 0-based rank within group
    # ONE pass assigns every (row, chunk) replica (r9, guide §2.4 /
    # §5): a row lands in its own chunk (__warm=False) plus every
    # later chunk that still needs it as warmup — sequence(own,
    # last_need) is never descending because W ≥ 1. The former
    # real-UNION-warm staging referenced the join subtree twice, so
    # the rank window and the gmin broadcast each ran twice per query;
    # the (row, chunk, warm) multiset is identical.
    own = F.floor(rn_in / chunk_rows)
    last_need = F.floor((rn_in + W) / chunk_rows)
    staged = (
        ranked.join(gmin, on=by)
        .withColumn("__chunk0", own)
        .withColumn(
            "__chunk", F.explode(F.sequence(F.col("__chunk0"), last_need))
        )
        .withColumn("__warm", F.col("__chunk") != F.col("__chunk0"))
        .drop("__chunk0")
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__rn")
        for s, out in zip(spans, out_cols):
            pdf[out] = pdf[col].ewm(span=s, adjust=False).mean()
        return pdf.loc[~pdf["__warm"], in_cols + out_cols]

    return staged.groupBy(*by, "__chunk").applyInPandas(
        kernel, schema=schema
    )


def ema_truncated(
    col: str,
    span: int,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
    window: int | None = None,
) -> Column:
    """EMA(span) to full double precision WITHOUT Python — the
    chunked-scan alternative the risk register asks for (SURVEY.md
    §7.4 item 1).

    ``ewm(adjust=False)`` weights decay as (1−α)^j, so terms older
    than W = ceil(−53·ln2 / ln(1−α)) rows are below one double ULP of
    the result: folding only the last W values with the exact
    recurrence (seeded with the window's oldest value) reproduces the
    sequential kernel to < 1e-12 relative — and for rows earlier than
    W it IS exact, because the fold seeds with x₀. Executes as a
    bounded ROWS window + ``aggregate`` higher-order fold — stays in
    codegen, shuffles once on the group key, and has no
    one-giant-symbol sequential task. Trade: O(W) work per row
    (W≈250 for span 12, ≈480 for span 26), vs the Arrow kernel's
    O(1)-per-row sequential pass — pick per deployment.
    """
    import math

    a = 2.0 / (span + 1.0)
    W = window or math.ceil(-53.0 * math.log(2.0) / math.log(1.0 - a))
    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts).rowsBetween(-(W - 1), 0)
    arr = F.collect_list(F.col(col).cast("double")).over(w)
    tail = F.slice(arr, F.lit(2), F.greatest(F.size(arr) - 1, F.lit(0)))
    return F.aggregate(
        tail,
        F.element_at(arr, 1),
        lambda acc, x: acc * F.lit(1.0 - a) + F.lit(a) * x,
    )


def ichimoku(
    df: DataFrame,
    by: str = "symbol",
    ts: str = "timestamp",
    tenkan_n: int = 9,
    kijun_n: int = 26,
    senkou_n: int = 52,
) -> DataFrame:
    """Ichimoku Kinko Hyo: the five lines as pure window algebra —
    rolling midpoints (no smoothing recursion anywhere, unlike
    EMA-family indicators), with the cloud legs displaced FORWARD
    (value at t shows the midpoint computed kijun_n bars ago — a lag)
    and the chikou line displaced BACK (close from kijun_n bars ahead
    — a lead). Heads shorter than each window emit null (count gate),
    matching the NaN-head convention of the SMA family. One
    per-symbol sort shared by every line."""
    w = Window.partitionBy(by).orderBy(ts)

    def midpoint(n: int):
        win = w.rowsBetween(-(n - 1), 0)
        return F.when(
            F.count(F.lit(1)).over(win) >= n,
            (F.max("high").over(win) + F.min("low").over(win)) / 2.0,
        )

    tenkan = midpoint(tenkan_n)
    kijun = midpoint(kijun_n)
    return df.select(
        by,
        ts,
        tenkan.alias("tenkan"),
        kijun.alias("kijun"),
        F.lag((tenkan + kijun) / 2.0, kijun_n).over(w).alias("senkou_a"),
        F.lag(midpoint(senkou_n), kijun_n).over(w).alias("senkou_b"),
        F.lead("close", kijun_n).over(w).alias("chikou"),
    )


def _wilder_fold(col: str, n: int, w_sort, window: int | None = None):
    """Wilder smoothing S_t = (1−1/n)·S_{t−1} + (1/n)·x_t as the
    bounded-window fold (the :func:`ema_truncated` device at
    α = 1/n, seeded with the window's oldest value): terms past
    W = ceil(−53·ln2/ln(1−1/n)) are below one double ULP, an SQL twin
    replays it with ``list_reduce`` (same seed convention)."""
    import math

    a = 1.0 / n
    W = window or math.ceil(-53.0 * math.log(2.0) / math.log(1.0 - a))
    win = w_sort.rowsBetween(-(W - 1), 0)
    arr = F.collect_list(F.col(col).cast("double")).over(win)
    tail = F.slice(arr, F.lit(2), F.greatest(F.size(arr) - 1, F.lit(0)))
    return F.aggregate(
        tail,
        F.element_at(arr, 1),
        lambda acc, x: acc * F.lit(1.0 - a) + F.lit(a) * x,
    )


def adx(
    df: DataFrame,
    n: int = 14,
    by: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """Average Directional Index (Wilder): trend STRENGTH regardless
    of direction — the gate that keeps trend-following rules out of
    chop. ±DM pick the dominant single-sided move per bar, Wilder
    smoothing (α = 1/n) turns TR/±DM into ±DI, and ADX is the same
    smoothing applied to DX = 100·|+DI − −DI|/(+DI + −DI).

    Four sequential recurrences, zero Python: each is the bounded
    truncated fold of :func:`_wilder_fold` (sub-ULP past ~496 rows at
    n=14), staged via intermediate columns so codegen units stay small
    (the black_scholes lesson). One per-symbol sort shared by all
    windows; an SQL twin replays the folds with ``list_reduce``."""
    w = Window.partitionBy(by).orderBy(ts)
    up = F.col("high") - F.lag("high").over(w)
    dn = F.lag("low").over(w) - F.col("low")
    tr = F.greatest(
        F.col("high") - F.col("low"),
        F.abs(F.col("high") - F.lag("close").over(w)),
        F.abs(F.col("low") - F.lag("close").over(w)),
    )
    base = (
        df.withColumns(
            {
                "__pdm": F.when((up > dn) & (up > 0), up).otherwise(F.lit(0.0)),
                "__ndm": F.when((dn > up) & (dn > 0), dn).otherwise(F.lit(0.0)),
                "__tr": tr,
            }
        )
        .filter(F.col("__tr").isNotNull())
    )
    base = base.withColumns(
        {
            "__str": _wilder_fold("__tr", n, w),
            "__spdm": _wilder_fold("__pdm", n, w),
            "__sndm": _wilder_fold("__ndm", n, w),
        }
    )
    pdi = 100.0 * F.col("__spdm") / F.col("__str")
    ndi = 100.0 * F.col("__sndm") / F.col("__str")
    base = base.withColumns(
        {
            "__pdi": pdi,
            "__ndi": ndi,
            # a window with NO directional movement on either side has
            # DX 0 by convention — and an explicit 0.0 keeps the ADX
            # fold's window content identical across engines (a null
            # here would be DROPPED by collect_list but KEPT by SQL
            # list(), silently desynchronizing the recurrence)
            "__dx": F.when(
                (pdi + ndi) > 0, 100.0 * F.abs(pdi - ndi) / (pdi + ndi)
            ).otherwise(F.lit(0.0)),
        }
    )
    return base.withColumn("__adx", _wilder_fold("__dx", n, w)).select(
        by,
        ts,
        F.col("__pdi").alias("plus_di"),
        F.col("__ndi").alias("minus_di"),
        F.col("__dx").alias("dx"),
        F.col("__adx").alias("adx"),
    )


def mfi(
    df: DataFrame,
    n: int = 14,
    by: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """Money Flow Index: volume-weighted RSI — positive/negative money
    flow (typical price × volume, signed by the TP move) summed over
    the trailing n bars, MFI = 100·pos/(pos+neg). Flat TP bars join
    neither side (Wilder's convention). Pure conditional window sums
    over one per-symbol sort; null until n flows exist."""
    w = Window.partitionBy(by).orderBy(ts)
    win = w.rowsBetween(-(n - 1), 0)
    tp = (F.col("high") + F.col("low") + F.col("close")) / 3.0
    base = df.withColumn("__tp", tp).withColumn(
        "__dtp", F.col("__tp") - F.lag("__tp").over(w)
    )
    base = base.filter(F.col("__dtp").isNotNull())
    flow = F.col("__tp") * F.col("volume")
    pos = F.sum(F.when(F.col("__dtp") > 0, flow).otherwise(F.lit(0.0))).over(win)
    neg = F.sum(F.when(F.col("__dtp") < 0, flow).otherwise(F.lit(0.0))).over(win)
    out = F.when(
        (F.count(F.lit(1)).over(win) >= n) & ((pos + neg) > 0),
        100.0 * pos / (pos + neg),
    )
    return base.select(by, ts, out.alias("mfi"))


def heikin_ashi(
    df: DataFrame,
    by: str = "symbol",
    ts: str = "timestamp",
    window: int = 55,
) -> DataFrame:
    """Heikin-Ashi candles: ha_close = (O+H+L+C)/4 per bar, and the
    RECURSIVE ha_open_t = (ha_open_{t−1} + ha_close_{t−1})/2 — the
    trend-smoothing candle transform charting stacks ship.

    The recursion is an α=½ exponential average of the lagged
    ha_close, so the :func:`ema_truncated` device applies with a tiny
    horizon: the seed's influence halves per bar, so a 55-bar window
    fold (seeded with the window's oldest element of
    y_t = coalesce(lag(ha_close), (open₁+close₁)/2)) reproduces the
    full recursion below one double ULP — and the SQL twin truncates
    IDENTICALLY (list_reduce over the same frame), so the engines
    agree bit-for-bit by construction. ha_high/ha_low wrap the raw
    extremes around both derived opens. Pure codegen, one per-symbol
    sort."""
    w = Window.partitionBy(by).orderBy(ts)
    hc = (
        F.col("open") + F.col("high") + F.col("low") + F.col("close")
    ) / 4.0
    base = df.withColumn("__hc", hc).withColumn(
        "__y",
        F.coalesce(
            F.lag("__hc").over(w),
            (F.col("open") + F.col("close")) / 2.0,
        ),
    )
    win = w.rowsBetween(-(window - 1), 0)
    arr = F.collect_list("__y").over(win)
    tail = F.slice(arr, F.lit(2), F.greatest(F.size(arr) - 1, F.lit(0)))
    ho = F.aggregate(
        tail,
        F.element_at(arr, 1),
        lambda acc, x: acc * F.lit(0.5) + F.lit(0.5) * x,
    )
    base = base.withColumn("__ho", ho)
    return base.select(
        by,
        ts,
        F.col("__ho").alias("ha_open"),
        F.greatest("high", "__ho", "__hc").alias("ha_high"),
        F.least("low", "__ho", "__hc").alias("ha_low"),
        F.col("__hc").alias("ha_close"),
    )


def riskmetrics_vol(
    df: DataFrame,
    price_col: str = "close",
    lam: float = 0.94,
    by: str = "symbol",
    ts: str = "timestamp",
    window: int | None = None,
) -> DataFrame:
    """RiskMetrics EWMA volatility per bar: σ²_t = λσ²_{t−1} +
    (1−λ)r²_t with the industry λ=0.94 (J.P. Morgan RiskMetrics) —
    the responsive conditional-vol estimate VaR desks actually run,
    next to the equal-weight ``realized_vol_daily``.

    Same engine-portable device as :func:`ema_truncated`: terms older
    than W = ceil(−53·ln2/ln λ) (≈594 rows at λ=0.94) are below one
    double ULP, so a bounded ROWS window + ``aggregate`` fold seeded
    with the window's oldest r² reproduces the sequential recurrence
    — codegen-only, one group-key shuffle, no giant-symbol sequential
    task; an SQL twin replays the identical fold with ``list_reduce``
    (which seeds with the first element, the exact same convention).
    """
    import math

    W = window or math.ceil(-53.0 * math.log(2.0) / math.log(lam))
    wlag = Window.partitionBy(by).orderBy(ts)
    r = F.log(F.col(price_col) / F.lag(price_col).over(wlag))
    base = df.withColumn("__r2", r * r).filter(F.col("__r2").isNotNull())
    w = Window.partitionBy(by).orderBy(ts).rowsBetween(-(W - 1), 0)
    arr = F.collect_list("__r2").over(w)
    tail = F.slice(arr, F.lit(2), F.greatest(F.size(arr) - 1, F.lit(0)))
    ewma = F.aggregate(
        tail,
        F.element_at(arr, 1),
        lambda acc, x: acc * F.lit(lam) + F.lit(1.0 - lam) * x,
    )
    return base.select(
        by, ts, F.sqrt(ewma).alias("ewma_vol")
    )


def lead_lag_xcorr(
    df: DataFrame,
    price_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
    max_lag: int = 3,
) -> DataFrame:
    """Lead–lag cross-correlation structure between every symbol pair:
    corr(r_a(t), r_b(t+k)) for k ∈ [−max_lag, +max_lag], plus the lag
    with the largest |corr| — the price-discovery diagnostic (a
    positive best lag means a LEADS b). ``return_correlation`` gives
    the k=0 matrix; this finds the asymmetry it averages away.

    Plan: per-symbol returns once, one ts-equi self-join (a.symbol <
    b.symbol), the 2·max_lag lead/lag columns share ONE per-pair sort
    window, then a single aggregate computes all 2k+1 correlations;
    argmax is closed-form ``array_min`` over (−|corr|, lag) structs
    (deterministic tie → smallest lag). Pairs × bars rows — the pair
    count is |symbols|², never fact-squared.
    """
    wlag = Window.partitionBy(by).orderBy(ts)
    r = df.select(
        F.col(by).alias("__s"),
        F.col(ts).alias("__ts"),
        F.log(F.col(price_col) / F.lag(price_col).over(wlag)).alias("__r"),
    ).filter(F.col("__r").isNotNull())
    a = r.select(
        F.col("__s").alias("symbol_a"), "__ts", F.col("__r").alias("__ra")
    )
    b = r.select(
        F.col("__s").alias("symbol_b"), "__ts", F.col("__r").alias("__rb")
    )
    joined = a.join(b, "__ts").filter(F.col("symbol_a") < F.col("symbol_b"))
    wp = Window.partitionBy("symbol_a", "symbol_b").orderBy("__ts")
    lags = list(range(-max_lag, max_lag + 1))
    cols = {}
    for k in lags:
        shifted = (
            F.lead("__rb", k).over(wp) if k >= 0 else F.lag("__rb", -k).over(wp)
        )
        cols[f"__b{k + max_lag}"] = shifted
    joined = joined.withColumns(cols)
    agg = joined.groupBy("symbol_a", "symbol_b").agg(
        F.count(F.lit(1)).alias("n_obs"),
        *[
            F.corr("__ra", f"__b{k + max_lag}").alias(f"corr_{k + max_lag}")
            for k in lags
        ],
    )
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    (-F.abs(F.col(f"corr_{k + max_lag}"))).alias("negabs"),
                    F.lit(k).alias("lag"),
                    F.col(f"corr_{k + max_lag}").alias("c"),
                )
                for k in lags
            ]
        )
    )
    return agg.select(
        "symbol_a",
        "symbol_b",
        "n_obs",
        F.col(f"corr_{max_lag}").alias("corr_lag0"),
        best["lag"].alias("best_lag"),
        best["c"].alias("best_corr"),
    )


def with_ema_macd(
    df: DataFrame,
    col: str = "close",
    spans: list[int] = (12, 26),
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> DataFrame:
    """EMA columns + MACD line/signal/histogram in ONE grouped-map pass.

    ``with_ema`` + ``with_macd`` chained would shuffle and cross the
    Python boundary twice and compute the fast/slow EWMs twice; the
    whole family shares one per-symbol sort, so fuse it (used by
    ``calculate_all``).
    """
    from pyspark.sql import types as T

    spans = list(spans)
    by = list(by)
    ema_cols = [f"ema_{s}" for s in spans]
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(c, T.DoubleType(), True) for c in ema_cols]
        + [
            T.StructField("macd", T.DoubleType(), True),
            T.StructField("macd_signal", T.DoubleType(), True),
            T.StructField("macd_hist", T.DoubleType(), True),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts)
        ewms = {s: pdf[col].ewm(span=s, adjust=False).mean() for s in {*spans, fast, slow}}
        for s, out in zip(spans, ema_cols):
            pdf[out] = ewms[s]
        macd_line = ewms[fast] - ewms[slow]
        pdf["macd"] = macd_line
        pdf["macd_signal"] = macd_line.ewm(span=signal, adjust=False).mean()
        pdf["macd_hist"] = pdf["macd"] - pdf["macd_signal"]
        return pdf

    return df.groupBy(*by).applyInPandas(kernel, schema=schema)


def with_macd(
    df: DataFrame,
    col: str = "close",
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> DataFrame:
    """MACD line / signal / histogram (``technical_indicators.py:31-47``)."""
    from pyspark.sql import types as T

    by = list(by)
    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("macd", T.DoubleType(), True),
            T.StructField("macd_signal", T.DoubleType(), True),
            T.StructField("macd_hist", T.DoubleType(), True),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts)
        exp1 = pdf[col].ewm(span=fast, adjust=False).mean()
        exp2 = pdf[col].ewm(span=slow, adjust=False).mean()
        macd_line = exp1 - exp2
        pdf["macd"] = macd_line
        pdf["macd_signal"] = macd_line.ewm(span=signal, adjust=False).mean()
        pdf["macd_hist"] = pdf["macd"] - pdf["macd_signal"]
        return pdf

    return df.groupBy(*by).applyInPandas(kernel, schema=schema)


def calculate_all(
    df: DataFrame, by: list[str] = ("symbol",), ts: str = "timestamp"
) -> DataFrame:
    """All 13 indicator columns in one pass
    (``technical_indicators.py:83-122`` column contract: sma_20/50/200,
    ema_12/26, rsi, macd, macd_signal, macd_hist, bb_middle/upper/lower,
    atr). Window expressions share one (symbol-partitioned) sort; the
    EMA kernel adds a single grouped-map stage.
    """
    by = list(by)
    bb = bollinger("close", 20, 2.0, by, ts)
    df = df.withColumns(
        {
            "sma_20": sma("close", 20, by, ts),
            "sma_50": sma("close", 50, by, ts),
            "sma_200": sma("close", 200, by, ts),
            "rsi": rsi("close", 14, by, ts),
            "bb_middle": bb["bb_middle"],
            "bb_upper": bb["bb_upper"],
            "bb_lower": bb["bb_lower"],
            "atr": atr(14, by, ts),
        }
    )
    return with_ema_macd(df, "close", [12, 26], by=by, ts=ts)


def volume_profile(
    df: DataFrame,
    price_col: str = "close",
    volume_col: str = "volume",
    bins: int = 100,
    by: list[str] = (),
) -> DataFrame:
    """Volume-weighted price histogram (A12,
    ``technical_indicators.py:73-81``): np.histogram(price, bins,
    weights=volume) → (price_level = bin center, volume = weighted count).

    Distributed form: one agg for min/max → bucket id arithmetic →
    groupBy(bucket). numpy puts the max value into the LAST bin
    (right-inclusive), reproduced with ``least(bins-1, ...)``.
    """
    by = list(by)
    p, v = F.col(price_col), F.col(volume_col)
    rng = df.groupBy(*by).agg(F.min(p).alias("__pmin"), F.max(p).alias("__pmax"))
    joined = df.join(F.broadcast(rng), on=by) if by else df.crossJoin(F.broadcast(rng))
    width = (F.col("__pmax") - F.col("__pmin")) / F.lit(bins)
    bucket = F.least(
        F.lit(bins - 1),
        F.floor((p - F.col("__pmin")) / width).cast("int"),
    ).alias("__bucket")
    out = (
        joined.select(*by, bucket, v.alias("__v"), F.col("__pmin"), width.alias("__w"))
        .groupBy(*by, "__bucket", "__pmin", "__w")
        .agg(F.sum("__v").alias("volume"))
        .select(
            *by,
            (F.col("__pmin") + (F.col("__bucket") + 0.5) * F.col("__w")).alias(
                "price_level"
            ),
            "volume",
        )
    )
    return out


def log_return(
    col: str | Column = "close",
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> Column:
    """Per-period log return ln(p_t / p_{t-1}) — the additive twin of
    ``pct_change`` (log returns sum across periods, so any coarser
    horizon is an agg over this column, no re-windowing). Null head per
    group; non-positive prices yield null (ln undefined), matching SQL
    semantics in both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.log(c / lag_col(c, by=by, ts=ts))


def realized_volatility(
    df: DataFrame,
    price_col: str = "close",
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> DataFrame:
    """Daily realized volatility: sqrt(sum r²) over each day's
    intraday log returns — the standard model-free vol estimate
    (Andersen-Bollerslev realized variance). One lag window per group
    + one (group, day) aggregate; the window partitions by symbol so
    it scales with symbols × days, never a global sort."""
    by = list(by)
    r = log_return(price_col, by=by, ts=ts)
    return (
        df.withColumn("__r", r)
        .groupBy(*by, F.to_date(ts).alias("day"))
        .agg(
            F.sqrt(F.sum(F.col("__r") * F.col("__r"))).alias("realized_vol"),
            F.count("__r").alias("n_returns"),
        )
    )


def max_drawdown(
    df: DataFrame,
    price_col: str = "close",
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> DataFrame:
    """Maximum drawdown per group: max over t of
    1 - price_t / runmax(price)_t, via a running-max window
    (UNBOUNDED PRECEDING .. CURRENT ROW) then a plain max — the
    peak-to-trough risk number every portfolio report carries. The
    running max partitions by symbol (bounded state per group, no
    global order); drawdown of a monotone-rising series is 0."""
    by = list(by)
    p = F.col(price_col)
    w = (
        Window.partitionBy(*by)
        .orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = 1 - p / F.max(p).over(w)
    return (
        df.withColumn("__dd", dd)
        .groupBy(*by)
        .agg(F.max("__dd").alias("max_drawdown"))
    )


def return_correlation(
    df: DataFrame,
    price_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """Pairwise Pearson correlation of per-symbol log returns — the
    portfolio co-movement matrix (upper triangle, sym_a < sym_b).

    Plan: one lag window per symbol, then a self-equi-join on the
    timestamp (inner — only co-observed periods correlate) and one
    ``corr`` aggregate per pair. Cost is O(T · S) rows fanned to
    O(T · S²/2) join output — right for portfolio-sized S (≤ hundreds);
    for thousands of symbols compute the gram matrix per time-block
    with a BLAS ``applyInPandas`` kernel instead (the
    ``similarity.cosine_pairs`` blocked pattern applied to returns).
    """
    r = log_return(price_col, by=[by], ts=ts)
    rr = (
        df.withColumn("__r", r)
        .filter(F.col("__r").isNotNull())
        .select(F.col(ts).alias("__t"), F.col(by).alias("__s"), "__r")
    )
    a, b = rr.alias("a"), rr.alias("b")
    return (
        a.join(b, on=(F.col("a.__t") == F.col("b.__t")) & (F.col("a.__s") < F.col("b.__s")))
        .groupBy(
            F.col("a.__s").alias("sym_a"), F.col("b.__s").alias("sym_b")
        )
        .agg(
            F.corr(F.col("a.__r"), F.col("b.__r")).alias("corr_r"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )


def return_correlation_gram(
    df: DataFrame,
    price_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """The thousands-of-symbols path for ``return_correlation``: the
    full pairwise Pearson matrix from ONE pass of BLAS partial moments,
    no O(T · S²) join fan-out — and exactly the self-join's
    PAIRWISE-COMPLETE semantics (each pair correlates over the
    timestamps where BOTH symbols have a return).

    Shape: pivot returns to a (time × symbols) panel with gaps kept as
    NaN; each Arrow batch contributes masked-matmul partials — with
    presence mask M and zero-filled values Z, the five k×k products
    MᵀM, ZᵀM, (Z∘Z)ᵀM, ZᵀZ hold every pair's co-observed n, sums,
    sum-squares and cross-sum — S²/2 summary rows per batch, NOT per
    observation. One groupBy((i,j)) sums the partials into the
    closed-form correlation; shuffle volume is O(batches · S²)
    doubles, independent of T. Co-observation is row-local, so the
    partials are exactly additive across batches.

    The symbol list is collected once (driver-side metadata, S names —
    same bounded-collect contract as the IVF centroid probe).
    """
    import pandas as pd

    r = log_return(price_col, by=[by], ts=ts)
    rr = (
        df.withColumn("__r", r)
        .filter(F.col("__r").isNotNull())
        .select(F.col(ts).alias("__t"), F.col(by).alias("__s"), "__r")
    )
    symbols = sorted(x[0] for x in rr.select("__s").distinct().collect())
    k = len(symbols)
    wide = rr.groupBy("__t").pivot("__s", symbols).agg(F.first("__r"))

    part_schema = (
        "i int, j int, n long, sx double, sy double, "
        "sxx double, syy double, sxy double"
    )

    def kernel(batches):
        import numpy as np

        iu, ju = np.triu_indices(k, 1)
        for pdf in batches:
            if pdf.empty:
                continue
            V = pdf[symbols].to_numpy(dtype="float64")
            M = (~np.isnan(V)).astype("float64")
            Z = np.nan_to_num(V)
            N = M.T @ M          # co-observed counts
            SX = Z.T @ M         # SX[i,j] = Σ z_i over rows where j present
            SXX = (Z * Z).T @ M
            SXY = Z.T @ Z
            yield pd.DataFrame(
                {
                    "i": iu,
                    "j": ju,
                    "n": N[iu, ju].astype("int64"),
                    "sx": SX[iu, ju],
                    "sy": SX[ju, iu],
                    "sxx": SXX[iu, ju],
                    "syy": SXX[ju, iu],
                    "sxy": SXY[iu, ju],
                }
            )

    part = wide.mapInPandas(kernel, part_schema)
    agg = part.groupBy("i", "j").agg(
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("sxx").alias("sxx"),
        F.sum("syy").alias("syy"),
        F.sum("sxy").alias("sxy"),
    )
    names = F.array(*[F.lit(s) for s in symbols])
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov = n * F.col("sxy") - sx * sy
    var_a = n * F.col("sxx") - sx * sx
    var_b = n * F.col("syy") - sy * sy
    return agg.filter(n > 0).select(
        F.element_at(names, F.col("i") + 1).alias("sym_a"),
        F.element_at(names, F.col("j") + 1).alias("sym_b"),
        (cov / F.sqrt(var_a * var_b)).alias("corr_r"),
        n.alias("n_obs"),
    )


def pairwise_cointegration(
    df: DataFrame,
    price_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """Engle–Granger-style pairs-trading diagnostics per symbol pair
    (upper triangle): OLS hedge ratio of log prices, the spread's AR(1)
    mean-reversion rate, and its half-life.

    Closed forms only — no iterative fitting:

    - ``beta``/``alpha`` — OLS of log P_b on log P_a over co-observed
      timestamps: beta = cov_pop(pa, pb) / var_pop(pa).
    - ``lambda`` — slope of Δe on lag(e) for the spread
      e = pb − alpha − beta·pa (the discrete Ornstein–Uhlenbeck
      pull); mean-reverting pairs have lambda < 0.
    - ``half_life`` — −ln 2 / ln(1 + lambda), rows to halve a shock
      (null when the spread is not mean-reverting).

    Plan: one timestamp self-equi-join (O(T·S²/2) pair rows — portfolio-
    sized S; see ``return_correlation`` for the BLAS path at thousands
    of symbols), one aggregate for beta/alpha broadcast back, one
    per-pair lag window, one final aggregate. The pair frame shuffles
    twice on (sym_a, sym_b) — Catalyst reuses the partitioning between
    the window and the final groupBy.
    """
    p = (
        df.select(
            F.col(by).alias("__s"),
            F.col(ts).alias("__t"),
            F.log(price_col).alias("__p"),
        )
        .filter(F.col("__p").isNotNull())
    )
    a, b = p.alias("a"), p.alias("b")
    pairs = a.join(
        b, on=(F.col("a.__t") == F.col("b.__t")) & (F.col("a.__s") < F.col("b.__s"))
    ).select(
        F.col("a.__s").alias("sym_a"),
        F.col("b.__s").alias("sym_b"),
        F.col("a.__t").alias("__t"),
        F.col("a.__p").alias("pa"),
        F.col("b.__p").alias("pb"),
    )
    ols = pairs.groupBy("sym_a", "sym_b").agg(
        (F.covar_pop("pa", "pb") / F.var_pop("pa")).alias("beta"),
        F.avg("pa").alias("__ma"),
        F.avg("pb").alias("__mb"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    ols = ols.withColumn("alpha", F.col("__mb") - F.col("beta") * F.col("__ma")).drop(
        "__ma", "__mb"
    )
    spread = pairs.join(F.broadcast(ols), ["sym_a", "sym_b"]).withColumn(
        "__e", F.col("pb") - F.col("alpha") - F.col("beta") * F.col("pa")
    )
    w = Window.partitionBy("sym_a", "sym_b").orderBy("__t")
    spread = spread.withColumn("__e_lag", F.lag("__e").over(w))
    out = (
        spread.filter(F.col("__e_lag").isNotNull())
        .groupBy("sym_a", "sym_b", "beta", "alpha", "n_obs")
        .agg(
            (
                F.covar_pop("__e_lag", F.col("__e") - F.col("__e_lag"))
                / F.var_pop("__e_lag")
            ).alias("lambda")
        )
    )
    phi = F.lit(1.0) + F.col("lambda")  # AR(1) coefficient
    return out.withColumn(
        "half_life",
        F.when((phi > 0) & (phi < 1), -F.log(F.lit(2.0)) / F.log(phi)),
    )


# ---------------------------------------------------------------------------
# Momentum oscillators, price channels, range-based volatility (the
# standard indicator families the reference's TechnicalIndicators class
# does not cover but its users compute downstream — same window algebra
# as W1–W6, so they ride the one symbol-partitioned sort for free)
# ---------------------------------------------------------------------------


def stochastic(
    n: int = 14,
    d: int = 3,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> dict[str, Column]:
    """Stochastic oscillator %K / %D.

    %K = 100·(close − min(low, n)) / (max(high, n) − min(low, n)),
    %D = SMA(%K, d). pandas ``rolling(n, min_periods=n)`` head parity
    via the same row-count mask as :func:`sma`; a flat n-bar range
    (max == min) yields null rather than a division blow-up.
    """
    by = list(by)
    win = _rolling(by, ts, n)
    lo = F.when(F.count("low").over(win) >= n, F.min("low").over(win))
    hi = F.when(F.count("high").over(win) >= n, F.max("high").over(win))
    rng = hi - lo
    k = F.when(rng > 0, 100.0 * (F.col("close") - lo) / rng)
    # %D is SMA(d) of %K — count the non-null %K rows so the mask
    # starts d−1 rows after %K itself becomes defined.
    wd = _rolling(by, ts, d)
    kd = F.when(F.count(k).over(wd) >= d, F.avg(k).over(wd))
    return {"stoch_k": k, "stoch_d": kd}


def williams_r(
    n: int = 14, by: list[str] = ("symbol",), ts: str = "timestamp"
) -> Column:
    """Williams %R = −100·(max(high,n) − close) / (max(high,n) − min(low,n)).

    The additive complement of stochastic %K (−100 ≤ %R ≤ 0); kept as
    its own helper because users expect the sign convention.
    """
    by = list(by)
    win = _rolling(by, ts, n)
    lo = F.when(F.count("low").over(win) >= n, F.min("low").over(win))
    hi = F.when(F.count("high").over(win) >= n, F.max("high").over(win))
    rng = hi - lo
    return F.when(rng > 0, -100.0 * (hi - F.col("close")) / rng)


def obv(by: list[str] = ("symbol",), ts: str = "timestamp") -> Column:
    """On-balance volume: running Σ sign(Δclose)·volume per key.

    First bar contributes 0 (no Δ) — the classic Granville seed.
    Cumulative per-key window: one shuffle on the key, no global sort.
    """
    by = list(by)
    delta = F.col("close") - lag_col("close", by, ts)
    step = (
        F.when(delta > 0, F.col("volume"))
        .when(delta < 0, -F.col("volume"))
        .otherwise(F.lit(0.0))
    )
    cum = _w(by, ts).rowsBetween(Window.unboundedPreceding, 0)
    return F.sum(step).over(cum)


def roc(
    col: str | Column,
    n: int = 10,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> Column:
    """Rate of change: 100·(x / lag(x, n) − 1) — the n-bar momentum
    generalization of F8 ``pct_change`` (null head of n rows)."""
    c = F.col(col) if isinstance(col, str) else col
    return 100.0 * (c / lag_col(c, list(by), ts, offset=n) - 1.0)


def donchian(
    n: int = 20, by: list[str] = ("symbol",), ts: str = "timestamp"
) -> dict[str, Column]:
    """Donchian channel: n-bar rolling high/low extremes + midline."""
    by = list(by)
    win = _rolling(by, ts, n)
    hi = F.when(F.count("high").over(win) >= n, F.max("high").over(win))
    lo = F.when(F.count("low").over(win) >= n, F.min("low").over(win))
    return {
        "donchian_upper": hi,
        "donchian_lower": lo,
        "donchian_mid": (hi + lo) / 2.0,
    }


def keltner(
    n: int = 20,
    atr_n: int = 10,
    mult: float = 2.0,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> dict[str, Column]:
    """Keltner channel, SMA variant: mid = SMA(typical price, n),
    bands = mid ± mult·ATR(atr_n).

    The SMA form (Keltner's original; Chester variant swaps in EMA) is
    chosen so the whole channel stays a closed-form window expression —
    no Python stage; the EMA-mid variant composes from
    :func:`with_ema` when exact Chester parity is needed.
    """
    by = list(by)
    tp = (F.col("high") + F.col("low") + F.col("close")) / 3.0
    win = _rolling(by, ts, n)
    mid = F.when(F.count(tp).over(win) >= n, F.avg(tp).over(win))
    a = atr(atr_n, by, ts)
    return {
        "keltner_mid": mid,
        "keltner_upper": mid + mult * a,
        "keltner_lower": mid - mult * a,
    }


def cci(
    n: int = 20, by: list[str] = ("symbol",), ts: str = "timestamp"
) -> Column:
    """Commodity Channel Index: (tp − SMA(tp,n)) / (0.015·MeanAbsDev).

    The mean absolute deviation is |tp_i − m| averaged over the SAME
    window whose mean m the current row sees — not a composition of
    two stacked windows (the inner mean changes per outer row). Solved
    as a bounded collect_list + two ``aggregate`` folds, all codegen:
    O(n) per row like every other rolling op here, no Python, no extra
    shuffle.
    """
    by = list(by)
    tp = ((F.col("high") + F.col("low") + F.col("close")) / 3.0).cast("double")
    win = _rolling(by, ts, n)
    arr = F.collect_list(tp).over(win)
    m = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x) / F.size(arr)
    mad = F.aggregate(
        arr, F.lit(0.0), lambda a, x: a + F.abs(x - m)
    ) / F.size(arr)
    out = (tp - m) / (0.015 * mad)
    return F.when((F.size(arr) >= n) & (mad > 0), out)


def parkinson_volatility(
    n: int = 20, by: list[str] = ("symbol",), ts: str = "timestamp"
) -> Column:
    """Parkinson range volatility:
    sqrt( Σ ln(high/low)² / (4·ln2·n) ) over an n-bar window —
    the high–low estimator (≈5× more efficient than close-to-close
    when bars are clean)."""
    import math

    by = list(by)
    hl2 = F.pow(F.log(F.col("high") / F.col("low")), 2)
    win = _rolling(by, ts, n)
    s = F.when(F.count(hl2).over(win) >= n, F.sum(hl2).over(win))
    return F.sqrt(s / (4.0 * math.log(2.0) * n))


def garman_klass_volatility(
    n: int = 20, by: list[str] = ("symbol",), ts: str = "timestamp"
) -> Column:
    """Garman–Klass OHLC volatility:
    sqrt( (1/n)·Σ [ ½·ln(high/low)² − (2ln2−1)·ln(close/open)² ] ).

    Uses all four OHLC fields; the per-bar term can go negative on
    gappy bars, so the rolling MEAN can too — null in that case (the
    estimator is undefined), matching how practitioners mask it.
    """
    import math

    by = list(by)
    term = 0.5 * F.pow(F.log(F.col("high") / F.col("low")), 2) - (
        2.0 * math.log(2.0) - 1.0
    ) * F.pow(F.log(F.col("close") / F.col("open")), 2)
    win = _rolling(by, ts, n)
    mean_t = F.when(F.count(term).over(win) >= n, F.avg(term).over(win))
    return F.when(mean_t >= 0, F.sqrt(mean_t))


def spearman_return_correlation(
    df: DataFrame,
    price_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """Pairwise SPEARMAN rank correlation of per-symbol log returns —
    the robust companion of :func:`return_correlation` (monotone
    association; immune to the heavy tails crypto returns carry).

    ρ_s = Pearson on fractional ranks. Ranks are computed per symbol
    in one window pass (average rank for ties: min-rank + (t−1)/2),
    then the same co-observed self-join + ``corr`` aggregate as the
    Pearson form. Note ranks are over each symbol's FULL observed
    span; pairs correlate the co-observed subset of those ranks (the
    standard listwise-then-join convention; document, don't hide).
    """
    r = log_return(price_col, by=[by], ts=ts)
    rr = (
        df.withColumn("__r", r)
        .filter(F.col("__r").isNotNull())
        .select(F.col(ts).alias("__t"), F.col(by).alias("__s"), "__r")
    )
    o = Window.partitionBy("__s").orderBy("__r")
    ties = Window.partitionBy("__s", "__r")
    ranked = rr.withColumn(
        "__rk", F.rank().over(o) + (F.count(F.lit(1)).over(ties) - 1) / 2.0
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    return (
        a.join(
            b,
            on=(F.col("a.__t") == F.col("b.__t"))
            & (F.col("a.__s") < F.col("b.__s")),
        )
        .groupBy(F.col("a.__s").alias("sym_a"), F.col("b.__s").alias("sym_b"))
        .agg(
            F.corr(F.col("a.__rk"), F.col("b.__rk")).alias("spearman_r"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )


def hurst_exponent(
    df: DataFrame,
    price_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
    lags: list[int] = (1, 2, 4, 8, 16),
) -> DataFrame:
    """Hurst exponent per symbol via the aggregated-variance method:
    Var[log p_t − log p_{t−τ}] ∝ τ^{2H}, so H is half the OLS slope
    of ln Var(τ) on ln τ. H≈0.5 random walk, >0.5 trending
    (persistent), <0.5 mean-reverting — the regime statistic behind
    ``pairwise_cointegration``'s half-life.

    Plan: one per-symbol sort produces ALL the lagged differences
    (one ``lag`` column per τ — same window, no extra shuffle), one
    aggregate computes every Var(τ), and the closed-form OLS slope
    over the |lags| (ln τ, ln Var) points folds in the same aggregate
    row. No joins, no Python; |lags| is a literal constant.
    """
    lags = list(lags)
    lp = F.log(F.col(price_col))
    w = Window.partitionBy(by).orderBy(ts)
    d = df.select(
        by,
        *[
            (lp - F.lag(lp, tau).over(w)).alias(f"__d{tau}")
            for tau in lags
        ],
    )
    import math

    agg = d.groupBy(by).agg(
        *[F.var_samp(f"__d{tau}").alias(f"__v{tau}") for tau in lags],
        F.count(F.lit(1)).alias("n_obs"),
    )
    # closed-form OLS of y = ln Var on x = ln tau: slope = Sxy/Sxx
    xs = [math.log(tau) for tau in lags]
    xbar = sum(xs) / len(xs)
    sxx = sum((x - xbar) ** 2 for x in xs)
    ys = [F.log(F.col(f"__v{tau}")) for tau in lags]
    ybar = sum(ys, F.lit(0.0)) / float(len(xs))
    sxy = sum(
        ((y - ybar) * F.lit(x - xbar) for x, y in zip(xs, ys)), F.lit(0.0)
    )
    return agg.select(
        by,
        "n_obs",
        (sxy / F.lit(2.0 * sxx)).alias("hurst"),
    )


def pivot_points(
    df: DataFrame,
    by: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """Classic floor-trader pivot levels per (symbol, day), from the
    PREVIOUS day's high/low/close: P=(H+L+C)/3, R1=2P−L, S1=2P−H,
    R2=P+(H−L), S2=P−(H−L).

    Plan: one groupBy((symbol, day)) daily rollup, one lag window over
    the (tiny) daily frame. Intraday bars never re-shuffle — levels
    join back by (symbol, day) with a broadcast when needed.
    """
    day = F.to_date(F.col(ts)).alias("day")
    daily = df.groupBy(by, day).agg(
        F.max("high").alias("__h"),
        F.min("low").alias("__l"),
        F.max_by("close", ts).alias("__c"),
    )
    w = Window.partitionBy(by).orderBy("day")
    ph, pl, pc = (F.lag(c).over(w) for c in ("__h", "__l", "__c"))
    p = (ph + pl + pc) / 3.0
    return daily.select(
        by,
        "day",
        p.alias("pivot"),
        (2.0 * p - pl).alias("r1"),
        (2.0 * p - ph).alias("s1"),
        (p + (ph - pl)).alias("r2"),
        (p - (ph - pl)).alias("s2"),
    )


def kyle_lambda(
    df: DataFrame,
    by: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """Kyle's lambda per symbol — the price-impact slope from the
    Kyle (1985) microstructure model: OLS of the bar price change on
    signed dollar volume sign(Δp)·(volume·close). Completes the
    liquidity triple next to Amihud and Roll (``microstructure
    metrics``): Amihud is impact per dollar in ratio form, lambda is
    the regression form with an R² to qualify it.

    Closed form — cov(Δp, q)/var(q) plus corr² — in ONE aggregate
    after the lag window; lambda is scaled ×1e6 (impact per million
    dollars) to sit in a readable range.
    """
    w = Window.partitionBy(by).orderBy(ts)
    dp = F.col("close") - F.lag("close").over(w)
    d = df.select(
        by,
        dp.alias("__dp"),
        (
            F.signum(dp) * F.col("volume") * F.col("close")
        ).alias("__q"),
    ).filter(F.col("__dp").isNotNull())
    return d.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_obs"),
        (F.covar_samp("__dp", "__q") / F.var_samp("__q") * 1e6).alias(
            "kyle_lambda_x1e6"
        ),
        F.pow(F.corr("__dp", "__q"), 2).alias("r2"),
    )


def inverse_vol_weights(
    df: DataFrame,
    price_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """Naive risk-parity portfolio: weight_i ∝ 1/σ_i of log returns,
    normalized to Σw = 1 — the standard volatility-budgeted allocation
    a risk stack derives right after :func:`realized_volatility`
    (full mean-variance needs a matrix inverse; inverse-vol is the
    diagonal approximation that needs only per-symbol aggregates).

    One lag window + one per-symbol aggregate; the Σ(1/σ) normalizer
    is a one-row broadcast crossJoin (the scalar-distribution shape).
    """
    r = log_return(price_col, by=[by], ts=ts)
    vols = (
        df.withColumn("__r", r)
        .filter(F.col("__r").isNotNull())
        .groupBy(by)
        .agg(
            F.stddev_samp("__r").alias("vol"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    total = vols.agg(
        F.sum(1.0 / F.col("vol")).alias("__inv_total")
    )
    return (
        vols.crossJoin(F.broadcast(total))
        .select(
            by,
            "n_obs",
            "vol",
            ((1.0 / F.col("vol")) / F.col("__inv_total")).alias("weight"),
        )
    )


def ljung_box(
    df: DataFrame,
    price_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
    n_lags: int = 10,
) -> DataFrame:
    """Ljung–Box portmanteau test per symbol on log returns — "is
    there ANY autocorrelation in the first h lags?", the standard
    white-noise gate before fitting forecast models (and the formal
    companion of the single-lag ``return_moments`` autocorrelation).

    Q = n(n+2)·Σ_{k=1..h} ρ̂_k²/(n−k), with ρ̂_k the lag-k sample
    autocorrelation in the standard biased form — autocovariance
    c_k/c_0 computed about the FULL-sample mean over the n−k
    overlapping pairs, all from one per-symbol sort producing the h
    lag columns and ONE aggregate. Q's null distribution is χ²(h);
    for even h the survival is the closed form
    exp(−Q/2)·Σ_{j<h/2} (Q/2)^j/j! (exact, engine-portable — same
    device as ``stats.benford_digit_test``); odd h raises.
    """
    if n_lags % 2 != 0:
        raise ValueError("n_lags must be even for the closed-form p-value")
    # Expressions as SQL text, one round trip per select list entry
    # (r10, guide §7.3 applied to construction — the Column-API loops
    # here cost ~2000 py4j round trips ≈ 1.2 s per build; pinned
    # sameSemantics-identical in tests/test_expr_text_semantics.py).
    r = log_return(price_col, by=[by], ts=ts)
    over = f"OVER (PARTITION BY `{by}` ORDER BY `{ts}`)"
    base = (
        df.withColumn("__r", r)
        .filter(F.col("__r").isNotNull())
        .select(
            by,
            "__r",
            *[
                F.expr(f"lag(__r, {k}) {over} AS __l{k}")
                for k in range(1, n_lags + 1)
            ],
        )
    )
    aggs = [
        F.expr("count(__r) AS n_obs"),
        F.expr("avg(__r) AS __mu"),
        # c0 as the biased (1/n) moment about the mean; the 1/n cancels
        # in the ratio with the ck below so raw sums suffice
        F.expr("sum(power(__r, 2)) AS __ss"),
    ]
    for k in range(1, n_lags + 1):
        aggs += [
            F.expr(f"sum(__r * __l{k}) AS __cp{k}"),
            F.expr(f"sum(__l{k}) AS __sl{k}"),
            F.expr(
                f"sum(CASE WHEN __l{k} IS NOT NULL THEN __r END) AS __sr{k}"
            ),
            F.expr(f"count(__l{k}) AS __nk{k}"),
        ]
    agg = base.groupBy(by).agg(*aggs)
    n = "CAST(n_obs AS DOUBLE)"
    c0 = f"(__ss - {n} * __mu * __mu)"
    q = "0.0D"
    for k in range(1, n_lags + 1):
        nk = f"CAST(__nk{k} AS DOUBLE)"
        # Σ (r_t−μ)(r_{t−k}−μ) over the nk overlapping pairs
        ck = f"(__cp{k} - __mu * __sl{k} - __mu * __sr{k} + {nk} * __mu * __mu)"
        rho = f"({ck} / {c0})"
        q = f"({q} + {rho} * {rho} / ({n} - {k}))"
    q = f"({n} * ({n} + 2.0D) * {q})"
    h = f"({q} / 2.0D)"
    terms = "1.0D"
    fact = 1.0
    for j in range(1, n_lags // 2):
        fact *= j
        terms = f"({terms} + power({h}, {float(j)!r}D) / {fact!r}D)"
    sf = f"(exp(-{h}) * {terms})"
    return agg.select(
        by,
        "n_obs",
        F.expr(f"{q} AS lb_q"),
        F.expr(f"least(1.0D, greatest(0.0D, {sf})) AS lb_pvalue"),
    )


def pacf(
    df: DataFrame,
    price_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """Partial autocorrelation of log returns at lags 1–3 per symbol —
    the AR-order fingerprint (ACF says "correlated at lag k"; PACF
    says "correlated at lag k AFTER removing lags < k", which is what
    picks p in an AR(p) model; beyond-reference, completing the
    ``ljung_box`` / ``return_autocorr_lag1`` diagnostics family).

    ρ̂_k uses the same biased convention as :func:`ljung_box`
    (autocovariance about the full-sample mean over the n−k
    overlapping pairs, normalized by c₀), then Durbin–Levinson turns
    ρ₁..ρ₃ into φ₁₁, φ₂₂, φ₃₃ in closed form:

        φ₁₁ = ρ₁
        φ₂₂ = (ρ₂ − ρ₁²)/(1 − ρ₁²),       φ₂₁ = ρ₁·(1 − φ₂₂)
        φ₃₃ = (ρ₃ − φ₂₁ρ₂ − φ₂₂ρ₁)/(1 − φ₂₁ρ₁ − φ₂₂ρ₂)

    Plan: one per-symbol sort window producing 3 lag columns, ONE
    aggregate, pure expression algebra after — no second pass, no
    Python. Every term is engine-portable (mirrored verbatim in the
    SQL oracle)."""
    r = log_return(price_col, by=[by], ts=ts)
    w = Window.partitionBy(by).orderBy(ts)
    base = (
        df.withColumn("__r", r)
        .filter(F.col("__r").isNotNull())
        .select(
            by,
            "__r",
            *[F.lag("__r", k).over(w).alias(f"__l{k}") for k in (1, 2, 3)],
        )
    )
    aggs = [
        F.count("__r").alias("n_obs"),
        F.avg("__r").alias("__mu"),
        F.sum(F.pow(F.col("__r"), 2)).alias("__ss"),
    ]
    for k in (1, 2, 3):
        aggs.append(F.sum(F.col("__r") * F.col(f"__l{k}")).alias(f"__cp{k}"))
        aggs.append(F.sum(f"__l{k}").alias(f"__sl{k}"))
        aggs.append(
            F.sum(
                F.when(F.col(f"__l{k}").isNotNull(), F.col("__r"))
            ).alias(f"__sr{k}")
        )
        aggs.append(F.count(f"__l{k}").alias(f"__nk{k}"))
    agg = base.groupBy(by).agg(*aggs)
    n = F.col("n_obs").cast("double")
    mu = F.col("__mu")
    c0 = F.col("__ss") - n * mu * mu

    def rho(k: int):
        nk = F.col(f"__nk{k}").cast("double")
        ck = (
            F.col(f"__cp{k}")
            - mu * F.col(f"__sl{k}")
            - mu * F.col(f"__sr{k}")
            + nk * mu * mu
        )
        return ck / c0

    r1, r2, r3 = rho(1), rho(2), rho(3)
    p11 = r1
    p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    p21 = r1 * (1.0 - p22)
    p33 = (r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2)
    return agg.select(
        by,
        "n_obs",
        r1.alias("acf_1"),
        r2.alias("acf_2"),
        r3.alias("acf_3"),
        p11.alias("pacf_1"),
        p22.alias("pacf_2"),
        p33.alias("pacf_3"),
    )


def information_coefficient(
    df: DataFrame,
    signal_col: str = "volume",
    price_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
    min_obs_per_day: int = 3,
) -> DataFrame:
    """Daily rank information coefficient of a signal against the
    next-bar forward return, per symbol — the standard alpha-research
    readout (Grinold/Kahn): IC_d = Spearman(signal_t, r_{t+1}) within
    day d, reported as mean IC, its dispersion, and the
    t-stat mean·√N/σ that says whether the signal predicts at all.

    Rank determinism: ranks are ``row_number`` ordered by
    ``(value, ts)`` — a total order both engines reproduce exactly
    (textbook Spearman midranks on ties would differ at the ULP level
    between engines for zero analytical gain on continuous signals).

    Plan: one per-symbol lag window (forward return), one per
    (symbol, day) window pair for the two ranks — same exchange —
    then two aggregates (per-day corr, per-symbol summary). Everything
    stays JVM expressions."""
    w = Window.partitionBy(by).orderBy(ts)
    fwd = F.log(F.lead(price_col).over(w) / F.col(price_col))
    base = (
        df.withColumn("__fwd", fwd)
        .filter(F.col("__fwd").isNotNull())
        .withColumn("__day", F.to_date(ts))
    )
    wd_sig = Window.partitionBy(by, "__day").orderBy(signal_col, ts)
    wd_ret = Window.partitionBy(by, "__day").orderBy("__fwd", ts)
    ranked = base.select(
        by,
        "__day",
        F.row_number().over(wd_sig).alias("__rs"),
        F.row_number().over(wd_ret).alias("__rr"),
    )
    daily = (
        ranked.groupBy(by, "__day")
        .agg(
            F.corr("__rs", "__rr").alias("__ic"),
            F.count(F.lit(1)).alias("__n"),
        )
        .filter(F.col("__n") >= min_obs_per_day)
    )
    out = daily.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.avg("__ic").alias("mean_ic"),
        F.stddev_samp("__ic").alias("ic_std"),
    )
    return out.select(
        by,
        "n_days",
        "mean_ic",
        "ic_std",
        (
            F.col("mean_ic")
            * F.sqrt(F.col("n_days").cast("double"))
            / F.col("ic_std")
        ).alias("ic_tstat"),
    )


def rolling_beta(
    df: DataFrame,
    n: int = 60,
    price_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """TIME-VARYING CAPM beta: cov(r, r_m)/var(r_m) over a trailing
    n-bar window against the equal-weight market return — the dynamic
    factor exposure next to the static ``market_beta`` aggregate
    (regime shifts show up as beta drift; the static number averages
    them away).

    Plan: the per-symbol lag window builds returns, one tiny
    per-timestamp aggregate builds the market return (broadcast back),
    then ``covar_samp``/``var_samp`` run straight over the trailing
    window — aggregate functions over windows, no self-join, one fact
    shuffle. Warmup rows (< n co-observations) abstain.
    """
    r = log_return(price_col, by=[by], ts=ts)
    rr = df.withColumn("__r", r).filter(F.col("__r").isNotNull())
    mkt = rr.groupBy(ts).agg(F.avg("__r").alias("__rm"))
    j = rr.join(F.broadcast(mkt), on=ts)
    w = Window.partitionBy(by).orderBy(ts).rowsBetween(-(n - 1), 0)
    cnt = F.count("__r").over(w)
    beta = F.covar_samp("__r", "__rm").over(w) / F.var_samp("__rm").over(w)
    return j.select(
        by,
        ts,
        F.when(cnt >= n, beta).alias("rolling_beta"),
    )


def jarque_bera(
    df: DataFrame,
    price_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """Jarque–Bera normality test per symbol on log returns:
    JB = n/6·(S² + K²/4) with sample skewness S and EXCESS kurtosis K
    from raw power sums (one aggregate after the lag window — the same
    moment algebra as the ``return_moments`` query). JB ~ χ²(2) under
    normality, whose survival is exactly exp(−JB/2) — no series, no
    approximation.
    """
    r = log_return(price_col, by=[by], ts=ts)
    d = df.withColumn("__r", r).filter(F.col("__r").isNotNull())
    agg = d.groupBy(by).agg(
        F.count("__r").alias("n_obs"),
        F.skewness("__r").alias("skew"),
        F.kurtosis("__r").alias("ex_kurt"),
    )
    n = F.col("n_obs").cast("double")
    jb = n / 6.0 * (
        F.pow(F.col("skew"), 2) + F.pow(F.col("ex_kurt"), 2) / 4.0
    )
    return agg.select(
        by,
        "n_obs",
        "skew",
        "ex_kurt",
        jb.alias("jb_stat"),
        F.exp(-jb / 2.0).alias("jb_pvalue"),
    )


def jump_detection(
    df: DataFrame,
    price_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """Realized-variance vs bipower-variation jump decomposition per
    symbol (Barndorff-Nielsen & Shephard): RV = Σ r², BV = (π/2)·
    Σ |r_t|·|r_{t−1}| — BV is robust to jumps, so the relative jump
    measure J = max(0, RV − BV)/RV reads off how much of the realized
    variance came from discontinuous moves (the input signal for
    jump-robust vol forecasting and for flagging data glitches that
    masquerade as price moves).

    One per-symbol sort yields r and its lag; ONE aggregate computes
    both measures. No Python, no second shuffle.
    """
    import math

    r = log_return(price_col, by=[by], ts=ts)
    w = Window.partitionBy(by).orderBy(ts)
    d = (
        df.withColumn("__r", r)
        .withColumn("__rl", F.lag("__r").over(w))
        .filter(F.col("__r").isNotNull())
    )
    agg = d.groupBy(by).agg(
        F.count("__r").alias("n_obs"),
        F.sum(F.pow("__r", 2)).alias("rv"),
        (
            F.lit(math.pi / 2.0)
            * F.sum(F.abs(F.col("__r")) * F.abs(F.col("__rl")))
        ).alias("bv"),
    )
    jump = F.greatest(F.lit(0.0), F.col("rv") - F.col("bv")) / F.col("rv")
    return agg.select(by, "n_obs", "rv", "bv", jump.alias("jump_share"))


def newey_west_mean(
    df: DataFrame,
    price_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
    n_lags: int = 5,
) -> DataFrame:
    """Mean log return with autocorrelation-robust (Newey–West/HAC)
    standard error per symbol: Var(r̄) = (γ̂₀ + 2·Σ_{k≤h} w_k·γ̂_k)/n
    with Bartlett weights w_k = 1 − k/(h+1) — the honest t-stat for
    "is this drift real" on serially-correlated returns (the naive
    se understates badly under momentum; compare both outputs).

    Same one-sort + one-aggregate autocovariance machinery as
    :func:`ljung_box` (γ̂_k about the full-sample mean, biased 1/n
    normalization — the standard HAC convention).
    """
    r = log_return(price_col, by=[by], ts=ts)
    w = Window.partitionBy(by).orderBy(ts)
    base = (
        df.withColumn("__r", r)
        .filter(F.col("__r").isNotNull())
        .select(
            by,
            "__r",
            *[
                F.lag("__r", k).over(w).alias(f"__l{k}")
                for k in range(1, n_lags + 1)
            ],
        )
    )
    aggs = [
        F.count("__r").alias("n_obs"),
        F.avg("__r").alias("mean_r"),
        F.sum(F.pow(F.col("__r"), 2)).alias("__ss"),
    ]
    for k in range(1, n_lags + 1):
        aggs += [
            F.sum(F.col("__r") * F.col(f"__l{k}")).alias(f"__cp{k}"),
            F.sum(f"__l{k}").alias(f"__sl{k}"),
            F.sum(
                F.when(F.col(f"__l{k}").isNotNull(), F.col("__r"))
            ).alias(f"__sr{k}"),
        ]
    agg = base.groupBy(by).agg(*aggs)
    n = F.col("n_obs").cast("double")
    mu = F.col("mean_r")
    g0 = (F.col("__ss") - n * mu * mu) / n
    lrv = g0
    for k in range(1, n_lags + 1):
        gk = (
            F.col(f"__cp{k}")
            - mu * F.col(f"__sl{k}")
            - mu * F.col(f"__sr{k}")
            + (n - k) * mu * mu
        ) / n
        lrv = lrv + 2.0 * (1.0 - k / (n_lags + 1.0)) * gk
    se_naive = F.sqrt(g0 / n)
    se_nw = F.sqrt(lrv / n)
    return agg.select(
        by,
        "n_obs",
        mu.alias("mean_r"),
        se_naive.alias("se_naive"),
        se_nw.alias("se_nw"),
        (mu / se_nw).alias("t_nw"),
    )


def vpin(
    df: DataFrame,
    n_buckets_window: int = 50,
    bucket_volume: float | None = None,
    by: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """VPIN — Volume-synchronized Probability of INformed trading
    (Easley, López de Prado, O'Hara): order-flow toxicity from volume
    buckets. Bars are cut into equal-VOLUME buckets (volume clock, not
    wall clock); per bucket the buy share is estimated by bulk volume
    classification Φ(Δp/σ) (the standard normal CDF of the
    standardized price change, A-S 7.1.26 erf — same polynomial both
    engines); VPIN = rolling mean over the trailing
    ``n_buckets_window`` buckets of |buy − sell|/V.

    Distributed volume clock WITHOUT a sequential scan: bucket id =
    floor(cumulative volume / bucket size) — one cumulative window per
    symbol assigns every bar its bucket, then one groupBy aggregates
    buckets and one rolling window computes VPIN. A bar straddling a
    bucket boundary is assigned wholly to the bucket its cumsum lands
    in (the documented approximation; exact splitting needs per-unit
    volume rows, which no one pays for at scale). ``bucket_volume``
    defaults to each symbol's mean bar volume × 50.
    """
    w = Window.partitionBy(by).orderBy(ts)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    dp = F.col("close") - F.lag("close").over(w)
    d = df.withColumns(
        {"__cumv": F.sum("volume").over(cum), "__dp": dp}
    ).filter(F.col("__dp").isNotNull())
    # per-symbol scale frame: sigma of price changes + bucket size
    scale = d.groupBy(by).agg(
        F.stddev_samp("__dp").alias("__sd"),
        (F.avg("volume") * 50).alias("__bv_default"),
    )
    d = d.join(F.broadcast(scale), on=by)
    bv = (
        F.lit(float(bucket_volume))
        if bucket_volume is not None
        else F.col("__bv_default")
    )
    z = F.col("__dp") / F.col("__sd") / F.sqrt(F.lit(2.0))
    az = F.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    erf = 1.0 - (
        t
        * (
            0.254829592
            + t
            * (
                -0.284496736
                + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))
            )
        )
    ) * F.exp(-az * az)
    buy_frac = 0.5 * (1.0 + F.signum(z) * erf)  # Φ(dp/σ)
    bucketed = d.withColumn(
        "__bucket", F.floor(F.col("__cumv") / bv)
    ).groupBy(by, "__bucket").agg(
        F.sum(F.col("volume") * buy_frac).alias("__buy"),
        F.sum("volume").alias("__v"),
    )
    wb = (
        Window.partitionBy(by)
        .orderBy("__bucket")
        .rowsBetween(-(n_buckets_window - 1), 0)
    )
    imb = F.abs(2.0 * F.col("__buy") - F.col("__v"))
    out = bucketed.withColumns(
        {
            "order_imbalance": imb / F.col("__v"),
            "vpin": F.when(
                F.count(F.lit(1)).over(wb) >= n_buckets_window,
                F.sum(imb).over(wb) / F.sum("__v").over(wb),
            ),
        }
    )
    return out.select(
        by,
        F.col("__bucket").alias("bucket"),
        F.col("__v").alias("bucket_volume"),
        "order_imbalance",
        "vpin",
    )


def _norm_cdf(z: Column) -> Column:
    """Standard normal CDF via the A-S 7.1.26 erf polynomial
    (|ε| < 1.5e-7) — the engine-portable closed form shared with
    :func:`vpin` and ``stats.mann_whitney_u``."""
    az = F.abs(z) / F.sqrt(F.lit(2.0))
    t = 1.0 / (1.0 + 0.3275911 * az)
    erf = 1.0 - (
        t
        * (
            0.254829592
            + t
            * (
                -0.284496736
                + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))
            )
        )
    ) * F.exp(-az * az)
    return 0.5 * (1.0 + F.signum(z) * erf)


def black_scholes_surface(
    df: DataFrame,
    moneyness: list[float] = (0.9, 1.0, 1.1),
    tenor_years: float = 30.0 / 365.0,
    rate: float = 0.0,
    vol_window: int = 60,
    periods_per_year: float = 24.0 * 365.0,
    by: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """Mark a small option surface on every bar: Black–Scholes call
    and put prices plus delta at the given moneyness levels, using the
    trailing realized volatility as the vol input — the derivatives
    mark-to-model readout a risk stack derives from the same bars it
    already scans (and the sensitivity panel behind the VaR family).

    Everything is closed-form codegen: rolling realized vol (the
    :func:`realized_volatility` window annualized by
    ``periods_per_year``), then per-strike d₁/d₂ and the A-S normal
    CDF. One per-symbol sort, zero joins; the strike grid multiplies
    columns, not rows.
    """
    import math

    r = log_return("close", by=[by], ts=ts)
    w = Window.partitionBy(by).orderBy(ts).rowsBetween(-(vol_window - 1), 0)
    d = df.withColumn("__r", r)
    ann = math.sqrt(periods_per_year)
    # STAGED projections: sigma, then d1/d2, then the four CDF values,
    # then prices. Inlining the CDF polynomial over the window
    # expression in one projection multiplies the expression tree
    # ~20x and blows the generated method past the JIT/codegen size
    # limits (measured 13x slower as a single projection at sf0.1) —
    # each withColumns below stays a small codegen unit and shares
    # the named intermediates.
    d = d.withColumn(
        "realized_vol_ann",
        F.when(
            F.count("__r").over(w) >= vol_window,
            F.stddev_samp("__r").over(w) * ann,
        ),
    )
    s0 = F.col("close")
    sigma = F.col("realized_vol_ann")
    tau = float(tenor_years)
    sq_t = math.sqrt(tau)
    disc = math.exp(-rate * tau)
    out_cols: list[str] = []
    for m in moneyness:
        tag = str(int(round(m * 100)))
        k = s0 * float(m)
        d = d.withColumns(
            {
                f"__d1_{tag}": (
                    F.log(s0 / k) + (rate + 0.5 * sigma * sigma) * tau
                )
                / (sigma * sq_t),
            }
        ).withColumn(f"__d2_{tag}", F.col(f"__d1_{tag}") - sigma * sq_t)
        d = d.withColumns(
            {
                f"__nd1_{tag}": _norm_cdf(F.col(f"__d1_{tag}")),
                f"__nd2_{tag}": _norm_cdf(F.col(f"__d2_{tag}")),
                f"__nmd1_{tag}": _norm_cdf(-F.col(f"__d1_{tag}")),
                f"__nmd2_{tag}": _norm_cdf(-F.col(f"__d2_{tag}")),
            }
        )
        inv_sqrt2pi = 1.0 / math.sqrt(2.0 * math.pi)
        pdf1 = inv_sqrt2pi * F.exp(
            -0.5 * F.col(f"__d1_{tag}") * F.col(f"__d1_{tag}")
        )
        d = d.withColumns(
            {
                f"call_{tag}": s0 * F.col(f"__nd1_{tag}")
                - k * disc * F.col(f"__nd2_{tag}"),
                f"put_{tag}": k * disc * F.col(f"__nmd2_{tag}")
                - s0 * F.col(f"__nmd1_{tag}"),
                f"delta_{tag}": F.col(f"__nd1_{tag}"),
                # greeks from the same staged intermediates — φ(d1)
                # is one exp, no extra CDF evaluations
                f"gamma_{tag}": pdf1 / (s0 * sigma * sq_t),
                f"vega_{tag}": s0 * pdf1 * sq_t,
                f"theta_call_{tag}": -s0 * pdf1 * sigma / (2.0 * sq_t)
                - rate * k * disc * F.col(f"__nd2_{tag}"),
            }
        )
        out_cols += [
            f"__d1_{tag}", f"__d2_{tag}", f"__nd1_{tag}",
            f"__nd2_{tag}", f"__nmd1_{tag}", f"__nmd2_{tag}",
        ]
    return d.drop("__r", *out_cols)


def implied_volatility(
    df: DataFrame,
    price_col: str,
    spot_col: str = "close",
    strike_col: str | None = None,
    moneyness: float = 1.0,
    tenor_years: float = 30.0 / 365.0,
    rate: float = 0.0,
    newton_steps: int = 6,
    sigma0: float = 0.5,
) -> DataFrame:
    """Black–Scholes implied volatility for an observed CALL price —
    an ITERATIVE solver expressed as a FIXED expression:
    ``newton_steps`` Newton–Raphson updates
    σ ← σ − (BS(σ) − price)/vega(σ) folded into ONE ``aggregate``
    over a step sequence (r9, guide §7.3 — the former per-step
    ``withColumns`` staging built 3 DataFrames per step, each
    re-analyzing a growing plan: ~3.8 s of driver-side plan
    construction per call at steps=6, 7× the execution itself; the
    same fix as :func:`american_put_binomial`). The fold lambda
    applies the IDENTICAL per-step arithmetic in the identical order —
    d₁/d₂/Φ/φ are recomputed from the same doubles instead of read
    from staged columns, which is bit-equal because double arithmetic
    is deterministic — so values are unchanged and the oracle replays
    the identical six steps. Six steps from σ₀ = 0.5 converge to
    ~1e-10 across the practical surface (Newton on BS-in-σ is
    superlinear; vega > 0 makes the map monotone) — no UDF, no
    driver loop, engine-portable arithmetic.

    Rows whose price violates no-arbitrage bounds (below intrinsic /
    above spot) come out null: Newton would diverge and the quote is
    bad data anyway — flag upstream, don't fit.
    """
    import math

    s0 = F.col(spot_col)
    k = F.col(strike_col) if strike_col else s0 * float(moneyness)
    p = F.col(price_col)
    tau = float(tenor_years)
    sq_t = math.sqrt(tau)
    disc = math.exp(-rate * tau)
    intrinsic = F.greatest(s0 - k * disc, F.lit(0.0))
    valid = (p > intrinsic) & (p < s0)
    inv_sqrt2pi = 1.0 / math.sqrt(2.0 * math.pi)
    init = F.when(valid, F.lit(float(sigma0)))

    def _newton(sig: Column, _i: Column) -> Column:
        d1 = (F.log(s0 / k) + (rate + 0.5 * sig * sig) * tau) / (sig * sq_t)
        d2 = d1 - sig * sq_t
        nd1 = _norm_cdf(d1)
        nd2 = _norm_cdf(d2)
        pdf1 = inv_sqrt2pi * F.exp(-0.5 * d1 * d1)
        bs = s0 * nd1 - k * disc * nd2
        vega = s0 * pdf1 * sq_t
        return F.when(
            valid, F.greatest(F.lit(1e-4), sig - (bs - p) / vega)
        )

    iv = init
    if newton_steps > 0:
        iv = F.aggregate(
            F.sequence(F.lit(1), F.lit(int(newton_steps))), init, _newton
        )
    return df.withColumn("implied_vol", iv)


def american_put_binomial(
    df: DataFrame,
    vol_col: str = "realized_vol_ann",
    spot_col: str = "close",
    moneyness: float = 1.0,
    tenor_years: float = 30.0 / 365.0,
    rate: float = 0.0,
    steps: int = 24,
) -> DataFrame:
    """American put via a Cox–Ross–Rubinstein binomial tree — DYNAMIC
    PROGRAMMING as pure unrolled codegen: the value vector over tree
    nodes is an ARRAY column; each backward-induction step is one
    staged projection mapping the array to one shorter with
    ``transform`` (continuation = discounted risk-neutral expectation,
    floored at early-exercise intrinsic). ``steps`` projections total,
    each O(steps) per row — no UDF, no driver loop, and the oracle can
    replay the identical tree with list ops.

    The American call on a non-dividend asset never exercises early
    (= European, priced closed-form in :func:`black_scholes_surface`),
    so the put is THE case where the tree earns its keep. Rows without
    a vol (warmup) pass through null.
    """
    import math

    s0 = F.col(spot_col)
    sig = F.col(vol_col)
    k = s0 * float(moneyness)
    dt = float(tenor_years) / steps
    disc = math.exp(-rate * dt)
    # u/d/p depend on the row's sigma — staged as columns once
    d = df.withColumns(
        {
            "__u": F.exp(sig * math.sqrt(dt)),
            "__dn": F.exp(-sig * math.sqrt(dt)),
        }
    ).withColumn(
        "__p",
        (F.lit(math.exp(rate * dt)) - F.col("__dn"))
        / (F.col("__u") - F.col("__dn")),
    )
    u, dn, p = F.col("__u"), F.col("__dn"), F.col("__p")
    # terminal payoffs: node j of n has spot S·u^j·d^(n−j)
    d = d.withColumn(
        "__v",
        F.transform(
            F.sequence(F.lit(0), F.lit(steps)),
            lambda j: F.greatest(
                F.lit(0.0),
                k
                - s0
                * F.pow(u, j.cast("double"))
                * F.pow(dn, F.lit(float(steps)) - j.cast("double")),
            ),
        ),
    )
    # Backward induction as ONE aggregate fold over the step sequence
    # (r9): the former per-step ``withColumn`` staging built 24
    # DataFrames, each re-analyzing a growing plan — 1.9 s of
    # driver-side plan construction per call at steps=24, more than
    # the execution itself. The fold is a single projection; the
    # lambda body applies the IDENTICAL per-element arithmetic in the
    # identical order (intrinsic/continuation/greatest), so values are
    # bit-equal (transform/aggregate HOFs were CodegenFallback in both
    # shapes — no codegen is lost). ``i`` arrives as the sequence
    # element instead of a Python literal; exact small-int doubles
    # subtract identically.
    def _step(v, i):
        cont = lambda j: F.lit(disc) * (
            p * F.element_at(v, j.cast("int") + 2)
            + (1.0 - p) * F.element_at(v, j.cast("int") + 1)
        )
        intrinsic = lambda j: F.greatest(
            F.lit(0.0),
            k
            - s0
            * F.pow(u, j.cast("double"))
            * F.pow(dn, i.cast("double") - j.cast("double")),
        )
        return F.transform(
            F.sequence(F.lit(0), i),
            lambda j: F.greatest(intrinsic(j), cont(j)),
        )

    d = d.withColumn(
        "__v",
        F.aggregate(
            F.sequence(F.lit(steps - 1), F.lit(0), F.lit(-1)),
            F.col("__v"),
            _step,
        ),
    )
    return d.withColumn(
        "american_put", F.element_at(F.col("__v"), 1)
    ).drop("__v", "__u", "__dn", "__p")


def vortex(
    n: int = 14,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> dict[str, Column]:
    """Vortex indicator VI+/VI− (Botes & Siepman): uptrend movement
    |high_t − low_{t−1}| vs downtrend |low_t − high_{t−1}|, each
    summed over the trailing n bars and normalized by the n-bar true
    range sum. Pure rolling sums over one per-symbol sort; null until
    n full (vm, tr) pairs exist (the first bar has no prior close, so
    the gate counts non-null TRs)."""
    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts)
    win = w.rowsBetween(-(n - 1), 0)
    vm_plus = F.abs(F.col("high") - F.lag("low").over(w))
    vm_minus = F.abs(F.col("low") - F.lag("high").over(w))
    tr = F.greatest(
        F.col("high") - F.col("low"),
        F.abs(F.col("high") - F.lag("close").over(w)),
        F.abs(F.col("low") - F.lag("close").over(w)),
    )
    str_n = F.sum(tr).over(win)
    gate = F.count(tr).over(win) >= n
    return {
        "vi_plus": F.when(gate & (str_n > 0), F.sum(vm_plus).over(win) / str_n),
        "vi_minus": F.when(
            gate & (str_n > 0), F.sum(vm_minus).over(win) / str_n
        ),
    }


def aroon(
    n: int = 25,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> dict[str, Column]:
    """Aroon up/down: 100·(n − bars-since-extreme)/n over the trailing
    n+1 bars, where ties resolve to the MOST RECENT extreme (the
    charting convention). Implemented as a bounded collect_list +
    reversed array_position — per-row O(n), stays in codegen; the SQL
    twin is the identical list_reverse/list_position expression, so
    tie-handling agrees by construction. Null until n+1 bars exist."""
    by = list(by)
    win = Window.partitionBy(*by).orderBy(ts).rowsBetween(-n, 0)
    highs = F.collect_list(F.col("high").cast("double")).over(win)
    lows = F.collect_list(F.col("low").cast("double")).over(win)
    since_hi = F.array_position(F.reverse(highs), F.array_max(highs)) - 1
    since_lo = F.array_position(F.reverse(lows), F.array_min(lows)) - 1
    gate = F.size(highs) >= (n + 1)
    return {
        "aroon_up": F.when(
            gate, 100.0 * (F.lit(n) - since_hi.cast("double")) / F.lit(n)
        ),
        "aroon_down": F.when(
            gate, 100.0 * (F.lit(n) - since_lo.cast("double")) / F.lit(n)
        ),
    }


def chaikin_flow(
    n: int = 20,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> dict[str, Column]:
    """Chaikin accumulation/distribution line + Chaikin Money Flow:
    money-flow multiplier ((C−L)−(H−C))/(H−L) (0 on doji bars where
    H=L, the standard convention) scales volume into money-flow
    volume; AD is its running sum, CMF(n) the rolling MFV sum over
    the rolling volume sum. Cumulative + bounded windows share one
    per-symbol sort."""
    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    win = w.rowsBetween(-(n - 1), 0)
    rng = F.col("high") - F.col("low")
    mfm = F.when(
        rng > 0,
        ((F.col("close") - F.col("low")) - (F.col("high") - F.col("close")))
        / rng,
    ).otherwise(F.lit(0.0))
    mfv = mfm * F.col("volume")
    vol_n = F.sum("volume").over(win)
    return {
        "ad_line": F.sum(mfv).over(cum),
        "cmf": F.when(
            (F.count(F.lit(1)).over(win) >= n) & (vol_n > 0),
            F.sum(mfv).over(win) / vol_n,
        ),
    }


def force_index(
    span: int = 13,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> Column:
    """Elder's force index: EMA(span) of (close_t − close_{t−1})·volume
    — the one-bar raw force smoothed by the standard 13-period EMA.
    The raw force is null on each symbol's first bar; the EMA is the
    truncated-window fold (:func:`ema_truncated` device) seeded with
    the first NON-NULL force, so caller must pre-filter the null head
    (the query drops it, keeping the fold's window content identical
    across engines — collect_list would silently skip nulls)."""
    by = list(by)
    import math

    a = 2.0 / (span + 1.0)
    W = math.ceil(-53.0 * math.log(2.0) / math.log(1.0 - a))
    win = Window.partitionBy(*by).orderBy(ts).rowsBetween(-(W - 1), 0)
    arr = F.collect_list(F.col("__force").cast("double")).over(win)
    tail = F.slice(arr, F.lit(2), F.greatest(F.size(arr) - 1, F.lit(0)))
    return F.aggregate(
        tail,
        F.element_at(arr, 1),
        lambda acc, x: acc * F.lit(1.0 - a) + F.lit(a) * x,
    )


def ease_of_movement(
    n: int = 14,
    volume_scale: float = 1.0e4,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> dict[str, Column]:
    """Arms' Ease of Movement: midpoint displacement per unit of
    volume-adjusted range — emv = Δmid / ((volume/scale)/(H−L)),
    eom(n) its n-bar SMA. Bars with zero range or zero volume emit
    null emv (excluded from the SMA by avg's null-skipping on BOTH
    engines). ``volume_scale`` replaces the classical 1e8 share
    divisor so synthetic-scale volumes keep O(1) magnitudes."""
    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts)
    win = w.rowsBetween(-(n - 1), 0)
    mid = (F.col("high") + F.col("low")) / 2.0
    dmid = mid - F.lag(mid).over(w)
    box = (F.col("volume") / F.lit(volume_scale)) / (
        F.col("high") - F.col("low")
    )
    emv = F.when(
        (F.col("high") > F.col("low")) & (F.col("volume") > 0), dmid / box
    )
    return {
        "emv": emv,
        "eom": F.when(F.count(F.lit(1)).over(win) >= n, F.avg(emv).over(win)),
    }


def drawdown_durations(
    df: DataFrame,
    price_col: str = "close",
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> DataFrame:
    """Underwater-spell anatomy per group: number of drawdown spells,
    longest/mean spell length (bars) and deepest depth (percent) —
    the duration view :func:`max_drawdown`'s single number hides.

    A bar is underwater when price < running max (strictly — touching
    a new high ends the spell). Spells are gaps-and-islands: a
    cumulative sum of spell-start flags labels each island, then two
    aggregates roll spells up per group. All windows partition by the
    group key (bounded state, no global order)."""
    by = list(by)
    p = F.col(price_col)
    w = Window.partitionBy(*by).orderBy(ts)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    under = (p < F.max(p).over(cum)).cast("int")
    base = df.withColumn("__under", under).withColumn(
        "__dd", 100.0 * (1.0 - p / F.max(p).over(cum))
    )
    start = (
        (F.col("__under") == 1)
        & (F.coalesce(F.lag("__under").over(w), F.lit(0)) == 0)
    ).cast("bigint")
    spells = (
        base.withColumn("__spell", F.sum(start).over(cum))
        .filter(F.col("__under") == 1)
        .groupBy(*by, "__spell")
        .agg(
            F.count(F.lit(1)).alias("__len"),
            F.max("__dd").alias("__depth"),
        )
    )
    return spells.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_spells"),
        F.max("__len").alias("longest_spell"),
        F.round(F.avg("__len"), 4).alias("avg_spell_len"),
        F.round(F.max("__depth"), 6).alias("max_depth_pct"),
    )


def variance_ratio(
    df: DataFrame,
    q: int = 5,
    price_col: str = "close",
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> DataFrame:
    """Lo–MacKinlay variance ratio VR(q) per group with the
    homoskedastic z statistic: var of overlapping q-period log
    returns over q x var of 1-period returns. VR < 1 flags mean
    reversion, > 1 momentum; |z| > 2 rejects the random walk. Window
    sums + two variance aggregates — the q-sum reuses the one
    per-group sort."""
    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts)
    win = w.rowsBetween(-(q - 1), 0)
    r = F.log(F.col(price_col) / F.lag(price_col).over(w))
    base = (
        df.withColumn("__r", r)
        .filter(F.col("__r").isNotNull())
        .withColumn(
            "__rq",
            F.when(F.count(F.lit(1)).over(win) >= q, F.sum("__r").over(win)),
        )
    )
    n = F.count("__r")
    vr = F.var_samp("__rq") / (F.lit(float(q)) * F.var_samp("__r"))
    zden = F.sqrt(
        F.lit(2.0 * (2.0 * q - 1.0) * (q - 1.0) / (3.0 * q)) / n
    )
    return base.groupBy(*by).agg(
        n.alias("n_obs"),
        F.round(vr, 4).alias("vr"),
        F.round((vr - 1.0) / zden, 4).alias("z_homo"),
    )


def probabilistic_sharpe(
    df: DataFrame,
    price_col: str = "close",
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> DataFrame:
    """Probabilistic Sharpe ratio (Bailey & López de Prado): the
    probability that the TRUE per-bar Sharpe exceeds 0 given the
    sample SR, adjusted for skewness and (Pearson) kurtosis of the
    return series — PSR = Phi(SR·sqrt(n−1) / sqrt(1 − g3·SR +
    (g4−1)/4·SR²)).

    Central moments come from raw power sums (one aggregate; the
    engine-portable route — built-in skewness/kurtosis differ in
    bias convention between engines), Phi is the shared A-S erf
    polynomial."""
    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts)
    r = F.log(F.col(price_col) / F.lag(price_col).over(w))
    base = df.withColumn("__r", r).filter(F.col("__r").isNotNull())
    agg = base.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.avg("__r").alias("__a1"),
        F.avg(F.pow("__r", 2)).alias("__a2"),
        F.avg(F.pow("__r", 3)).alias("__a3"),
        F.avg(F.pow("__r", 4)).alias("__a4"),
    )
    a1, a2, a3, a4 = (F.col(c) for c in ("__a1", "__a2", "__a3", "__a4"))
    m2 = a2 - a1 * a1
    m3 = a3 - 3 * a1 * a2 + 2 * a1 * a1 * a1
    m4 = a4 - 4 * a1 * a3 + 6 * a1 * a1 * a2 - 3 * F.pow(a1, 4)
    sr = a1 / F.sqrt(m2 * F.col("n_obs") / (F.col("n_obs") - 1))
    g3 = m3 / F.pow(m2, 1.5)
    g4 = m4 / (m2 * m2)
    denom = F.sqrt(1.0 - g3 * sr + (g4 - 1.0) / 4.0 * sr * sr)
    psr = _norm_cdf(sr * F.sqrt(F.col("n_obs") - 1.0) / denom)
    return agg.select(
        *by,
        F.col("n_obs"),
        F.round(sr, 6).alias("sharpe"),
        F.round(g3, 4).alias("skew"),
        F.round(g4, 4).alias("kurtosis"),
        F.round(psr, 6).alias("psr"),
    )


def garch11_vol(
    df: DataFrame,
    alpha: float = 0.08,
    beta: float = 0.90,
    price_col: str = "close",
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> DataFrame:
    """GARCH(1,1) conditional volatility FILTER with pinned (α, β)
    and variance-targeted ω = v·(1−α−β) (v = each group's
    unconditional return variance): σ²_t = ω + α·r²_{t−1} + β·σ²_{t−1},
    seeded at σ²_1 = v. Estimation is out of scope (pinned textbook
    persistence); the filter is what risk engines run per tick.

    The recursion contracts at rate β, so the :func:`ema_truncated`
    device applies: folding the last W = ceil(−53·ln2/ln β) lagged r²
    values (seeded with v) is sub-ULP vs the full recursion. v joins
    back as a broadcast one-row-per-group dim; the fold stays in
    codegen."""
    import math

    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts)
    W = math.ceil(-53.0 * math.log(2.0) / math.log(beta))
    r = F.log(F.col(price_col) / F.lag(price_col).over(w))
    base = (
        df.withColumn("__r", r)
        .filter(F.col("__r").isNotNull())
        .withColumn("__r2", F.col("__r") * F.col("__r"))
    )
    v = base.groupBy(*by).agg(F.var_samp("__r").alias("__v"))
    base = base.join(F.broadcast(v), on=by)
    arr = F.collect_list("__r2").over(w.rowsBetween(-W, -1))
    omega = F.col("__v") * F.lit(1.0 - alpha - beta)
    s2 = F.aggregate(
        arr,
        F.col("__v"),
        lambda acc, x: omega + F.lit(alpha) * x + F.lit(beta) * acc,
    )
    return base.select(
        *by,
        ts,
        F.round(100.0 * F.sqrt(s2), 6).alias("garch_vol_pct"),
        F.round(100.0 * F.sqrt(F.col("__v")), 6).alias("uncond_vol_pct"),
    )


def ou_half_life(
    df: DataFrame,
    price_col: str = "close",
    by: str = "symbol",
    ts: str = "timestamp",
) -> DataFrame:
    """Ornstein–Uhlenbeck half-life of mean reversion for every
    symbol pair's log-price spread: hedge ratio β =
    cov(logA, logB)/var(logB) (the Engle–Granger slope), spread
    s = logA − β·logB, then the AR(1) drift b = cov(Δs, s_{t−1}) /
    var(s_{t−1}) gives half-life = −ln2/ln(1+b) (defined for
    −1 < b < 0; null otherwise — a non-reverting spread has none).

    Two aggregate passes over a timestamp-aligned self-join
    (sym_a < sym_b upper triangle): pass 1 the hedge ratio, pass 2
    the spread AR(1) — both covariance algebra, no iteration."""
    p = F.log(F.col(price_col))
    rr = df.select(
        F.col(ts).alias("__t"), F.col(by).alias("__s"), p.alias("__p")
    )
    a, b = rr.alias("a"), rr.alias("b")
    pairs = a.join(
        b,
        on=(F.col("a.__t") == F.col("b.__t"))
        & (F.col("a.__s") < F.col("b.__s")),
    ).select(
        F.col("a.__s").alias("sym_a"),
        F.col("b.__s").alias("sym_b"),
        F.col("a.__t").alias("__t"),
        F.col("a.__p").alias("__pa"),
        F.col("b.__p").alias("__pb"),
    )
    hedge = pairs.groupBy("sym_a", "sym_b").agg(
        (F.covar_samp("__pa", "__pb") / F.var_samp("__pb")).alias("__beta"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    sp = pairs.join(F.broadcast(hedge), on=["sym_a", "sym_b"]).withColumn(
        "__s2", F.col("__pa") - F.col("__beta") * F.col("__pb")
    )
    wp = Window.partitionBy("sym_a", "sym_b").orderBy("__t")
    sp = (
        sp.withColumn("__slag", F.lag("__s2").over(wp))
        .withColumn("__ds", F.col("__s2") - F.col("__slag"))
        .filter(F.col("__ds").isNotNull())
    )
    bcoef = F.covar_samp("__ds", "__slag") / F.var_samp("__slag")
    return sp.groupBy("sym_a", "sym_b").agg(
        F.first("__beta").alias("__b0"),
        F.first("n_obs").alias("n_obs"),
        bcoef.alias("__ar"),
    ).select(
        "sym_a",
        "sym_b",
        "n_obs",
        F.round("__b0", 6).alias("hedge_beta"),
        F.round("__ar", 6).alias("ar1_coef"),
        F.round(
            F.when(
                (F.col("__ar") > -1.0) & (F.col("__ar") < 0.0),
                -F.log(F.lit(2.0)) / F.log(1.0 + F.col("__ar")),
            ),
            4,
        ).alias("half_life_bars"),
    )


def parabolic_sar(
    df: DataFrame,
    af_start: float = 0.02,
    af_step: float = 0.02,
    af_max: float = 0.2,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> DataFrame:
    """Wilder's Parabolic SAR: the stop-and-reverse trail that
    accelerates toward price while a trend persists and FLIPS sides
    when crossed. Unlike the EMA family the state (trend side, extreme
    point, acceleration factor) does not contract — a flip depends on
    the whole path — so no truncated-window fold applies; this is the
    honest per-symbol sequential kernel (Arrow ``applyInPandas``,
    linear per symbol, embarrassingly parallel across symbols), and
    the oracle replays the identical arithmetic as a recursive CTE
    stepping bar rank.

    Pinned convention (variants abound):
    - bar 2 seeds: trend = up iff close₂ > close₁; SAR = the two-bar
      low extreme (up) / high extreme (down); EP the opposite extreme;
      AF = ``af_start``.
    - step: SAR' = SAR + AF·(EP − SAR), clamped to not enter the prior
      two bars' range (min of the two prior lows for up / max of the
      two prior highs for down).
    - flip when the bar crosses SAR': new SAR = old EP, EP = the
      crossing bar's extreme, AF resets.
    - else EP/AF ratchet when a new extreme prints.
    Bar 1 emits null (no state yet)."""
    import numpy as np
    from pyspark.sql import types as T

    by = list(by)
    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("sar", T.DoubleType(), True),
            T.StructField("sar_trend", T.IntegerType(), True),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts).reset_index(drop=True)
        n = len(pdf)
        high = pdf["high"].to_numpy(dtype="float64")
        low = pdf["low"].to_numpy(dtype="float64")
        close = pdf["close"].to_numpy(dtype="float64")
        sar = np.full(n, np.nan)
        trend = np.zeros(n, dtype="int64")
        if n >= 2:
            up = close[1] > close[0]
            trend[1] = 1 if up else -1
            sar[1] = min(low[0], low[1]) if up else max(high[0], high[1])
            ep = max(high[0], high[1]) if up else min(low[0], low[1])
            af = af_start
            for i in range(2, n):
                s0 = sar[i - 1] + af * (ep - sar[i - 1])
                if trend[i - 1] == 1:
                    s0 = min(s0, low[i - 1], low[i - 2])
                    if low[i] < s0:
                        trend[i] = -1
                        sar[i] = ep
                        ep = low[i]
                        af = af_start
                    else:
                        trend[i] = 1
                        sar[i] = s0
                        if high[i] > ep:
                            ep = high[i]
                            af = min(af + af_step, af_max)
                else:
                    s0 = max(s0, high[i - 1], high[i - 2])
                    if high[i] > s0:
                        trend[i] = 1
                        sar[i] = ep
                        ep = high[i]
                        af = af_start
                    else:
                        trend[i] = -1
                        sar[i] = s0
                        if low[i] < ep:
                            ep = low[i]
                            af = min(af + af_step, af_max)
        pdf["sar"] = sar
        pdf["sar_trend"] = trend
        return pdf

    return df.groupBy(*by).applyInPandas(kernel, schema=schema)


def supertrend(
    df: DataFrame,
    n: int = 10,
    mult: float = 3.0,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> DataFrame:
    """SuperTrend(n, mult) with the SMA-ATR variant (the same rolling
    mean-TR the ``atr_14`` query pins, count-gated): basic bands
    (H+L)/2 ± mult·ATR ratchet into final bands (an upper band may
    only fall while price stays below it; symmetric for the lower),
    and the line flips sides when the close crosses the active band.

    The ratchet state does not contract (a band can hold its level
    indefinitely), so like :func:`parabolic_sar` this is the per-
    symbol sequential Arrow kernel with a recursive-CTE oracle. The
    bands are window-computed COLUMNS (pure codegen) before the
    kernel — Python touches only the 4-value recursion. Rows before
    the ATR gate (first n−1 bars) emit null."""
    import numpy as np
    from pyspark.sql import types as T

    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts)
    win = w.rowsBetween(-(n - 1), 0)
    tr = F.greatest(
        F.col("high") - F.col("low"),
        F.abs(F.col("high") - F.lag("close").over(w)),
        F.abs(F.col("low") - F.lag("close").over(w)),
    )
    base = df.withColumn("__tr", tr).withColumn(
        "__atr",
        F.when(F.count("__tr").over(win) >= n, F.avg("__tr").over(win)),
    )
    mid = (F.col("high") + F.col("low")) / 2.0
    base = base.withColumn("__bub", mid + F.lit(mult) * F.col("__atr"))
    base = base.withColumn("__blb", mid - F.lit(mult) * F.col("__atr"))

    schema = T.StructType(
        list(base.schema.fields)
        + [
            T.StructField("supertrend", T.DoubleType(), True),
            T.StructField("st_trend", T.IntegerType(), True),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts).reset_index(drop=True)
        m = len(pdf)
        close = pdf["close"].to_numpy(dtype="float64")
        bub = pdf["__bub"].to_numpy(dtype="float64")
        blb = pdf["__blb"].to_numpy(dtype="float64")
        st = np.full(m, np.nan)
        trend = np.zeros(m, dtype="int64")
        fub = flb = np.nan
        for i in range(m):
            if np.isnan(bub[i]):
                continue
            if np.isnan(fub):  # first banded bar seeds
                fub, flb = bub[i], blb[i]
                trend[i] = 1 if close[i] > fub else -1
            else:
                if bub[i] < fub or close[i - 1] > fub:
                    fub = bub[i]
                if blb[i] > flb or close[i - 1] < flb:
                    flb = blb[i]
                prev = trend[i - 1]
                if prev == -1 and close[i] > fub:
                    trend[i] = 1
                elif prev == 1 and close[i] < flb:
                    trend[i] = -1
                else:
                    trend[i] = prev
            st[i] = flb if trend[i] == 1 else fub
        pdf["supertrend"] = st
        pdf["st_trend"] = trend
        return pdf

    return (
        base.groupBy(*by)
        .applyInPandas(kernel, schema=schema)
        .drop("__tr", "__atr", "__bub", "__blb")
    )


def trix_frame(
    df: DataFrame,
    col: str = "close",
    span: int = 15,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> DataFrame:
    """TRIX(span): 1-bar percent rate of change of a TRIPLE EMA —
    three chained smoothing passes kill noise faster than one deep
    one, and the ROC turns the level into a momentum oscillator.

    Each EMA stage is the :func:`ema_truncated` bounded fold applied
    to the PREVIOUS stage's materialized column — three staged window
    passes sharing one per-symbol sort, all codegen, no Python. The
    truncation composes: every stage's seed influence decays at
    (1−α) per bar, so each is sub-ULP vs its full recursion, and the
    SQL twin truncates identically (staged list_reduce CTEs). Columns
    are staged because a lazily-nested window expression would
    re-evaluate each EMA stage per consumer."""
    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts)
    out = df.withColumn("__e1", ema_truncated(col, span, by=by, ts=ts))
    out = out.withColumn("__e2", ema_truncated("__e1", span, by=by, ts=ts))
    out = out.withColumn("__e3", ema_truncated("__e2", span, by=by, ts=ts))
    return out.withColumn(
        "trix_pct",
        100.0 * (F.col("__e3") / F.lag("__e3").over(w) - 1.0),
    ).withColumnRenamed("__e3", "ema3").drop("__e1", "__e2")


def elder_ray(
    span: int = 13,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> dict[str, Column]:
    """Elder Ray bull/bear power: high − EMA(span), low − EMA(span).

    Measures how far the extremes stray from the smoothed consensus
    price — positive bull power with a rising EMA is Elder's classic
    long filter.  The EMA is the :func:`ema_truncated` bounded fold
    (codegen, no Python, no sequential per-symbol task); both outputs
    share the one fold column.
    """
    e = ema_truncated("close", span, by=by, ts=ts)
    return {
        "bull_power": F.col("high") - e,
        "bear_power": F.col("low") - e,
    }


def stochrsi(
    n: int = 14,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
    rsi_col: str | Column | None = None,
) -> Column:
    """StochRSI(n): the stochastic oscillator applied to RSI(n) —
    (RSI − min(RSI, n)) / (max(RSI, n) − min(RSI, n)) · 100.

    Rescales RSI onto its own n-bar range so regime shifts in RSI's
    level don't mute the signal.  Null until a full n-bar RSI window
    exists and when the range is degenerate (flat RSI) — both guards
    evaluate identically across engines.  Compose by staging the RSI
    column first (window-over-window would re-evaluate the inner RSI
    per consumer); pass it via ``rsi_col``.
    """
    c = F.col(rsi_col) if isinstance(rsi_col, str) else (
        rsi_col if rsi_col is not None else rsi("close", n, by=by, ts=ts)
    )
    win = _rolling(list(by), ts, n)
    lo = F.min(c).over(win)
    hi = F.max(c).over(win)
    # ratio parenthesized FIRST: fp rounding is monotone, so
    # (c−lo)/(hi−lo) ∈ [0,1] exactly and the ×100 cannot overshoot —
    # the left-to-right form 100·(c−lo)/(hi−lo) lands 1 ULP above 100
    # whenever c == hi
    return F.when(
        (F.count(c).over(win) >= n) & (hi > lo),
        100.0 * ((c - lo) / (hi - lo)),
    )


def mass_index(
    df: DataFrame,
    n: int = 25,
    span: int = 9,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
    out: str = "mass_index",
) -> DataFrame:
    """Mass Index(n): Σ over the last n bars of EMA(span) of the
    high−low range over its own double smoothing EMA(span)∘EMA(span).

    Donald Dorsey's range-bulge detector — a reading above ~27 flags
    volatility expansion regardless of direction.  Both EMA stages are
    :func:`ema_truncated` bounded folds staged as materialized columns
    (same device as :func:`trix_frame`), then one rolling sum; the
    whole thing is a single per-symbol sort, zero Python.
    """
    by = list(by)
    staged = df.withColumn("__rng", F.col("high") - F.col("low"))
    staged = staged.withColumn(
        "__e1", ema_truncated("__rng", span, by=by, ts=ts)
    )
    staged = staged.withColumn(
        "__e2", ema_truncated("__e1", span, by=by, ts=ts)
    )
    win = _rolling(by, ts, n)
    ratio = F.col("__e1") / F.col("__e2")
    return staged.withColumn(
        out,
        F.when(F.count(ratio).over(win) >= n, F.sum(ratio).over(win)),
    ).drop("__rng", "__e1", "__e2")


def corwin_schultz(
    daily: DataFrame,
    by: list[str] = ("symbol",),
    ts: str = "day",
) -> DataFrame:
    """Corwin–Schultz (2012) high–low spread estimator on daily bars.

    Uses the insight that the daily high/low range reflects both
    variance and the bid–ask bounce, while the TWO-day range reflects
    the same spread but twice the variance:

        β = ln(H_t/L_t)² + ln(H_{t−1}/L_{t−1})²
        γ = ln(max(H_t,H_{t−1}) / min(L_t,L_{t−1}))²
        α = (√(2β) − √β)/(3 − 2√2) − √(γ/(3 − 2√2))
        S = 2(eᵅ − 1)/(1 + eᵅ), floored at 0 (negative α ⇒ no
            detectable spread that day — the standard treatment)

    Pure per-row arithmetic over one lag window — deterministic in
    both engines, no unordered sums anywhere.  Expects one row per
    (group, day) with ``high``/``low`` columns; emits ``cs_spread``
    (floored) and ``cs_alpha``.
    """
    import math

    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts)
    h1, l1 = F.lag("high").over(w), F.lag("low").over(w)
    beta = (
        F.pow(F.log(F.col("high") / F.col("low")), 2)
        + F.pow(F.log(h1 / l1), 2)
    )
    gamma = F.pow(
        F.log(F.greatest(F.col("high"), h1) / F.least(F.col("low"), l1)), 2
    )
    denom = F.lit(3.0 - 2.0 * math.sqrt(2.0))
    alpha = (F.sqrt(2.0 * beta) - F.sqrt(beta)) / denom - F.sqrt(
        gamma / denom
    )
    spread = 2.0 * (F.exp(alpha) - 1.0) / (1.0 + F.exp(alpha))
    return daily.withColumn("cs_alpha", alpha).withColumn(
        "cs_spread", F.greatest(spread, F.lit(0.0))
    )


def hill_tail_index(
    df: DataFrame,
    col: str = "r",
    k: int = 100,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> DataFrame:
    """Hill estimator of the return-distribution tail index.

    ξ̂ = (1/k) Σᵢ₌₁..k ln(x₍ᵢ₎ / x₍ₖ₊₁₎) over the k largest |values|;
    tail α = 1/ξ̂ (α < 3 ⇒ infinite-kurtosis territory — fat-tail
    gate before any Gaussian-assumption model).  Distributed shape:
    rank by |value| per group (one window sort), keep the top k+1
    rows, then ONE aggregate per group — x₍ₖ₊₁₎ is exactly the
    group's min, and the k log-ratio terms fold in rank order via a
    sorted-array aggregate so both engines sum in the same order.
    """
    by = list(by)
    absr = F.abs(F.col(col))
    ranked = (
        df.filter(F.col(col).isNotNull() & (absr > 0))
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy(*by).orderBy(
                    F.abs(F.col(col)).desc(), F.col(ts).asc()
                )
            ),
        )
        .filter(F.col("__rk") <= k + 1)
        .withColumn("__absr", F.abs(F.col(col)))
    )
    # fold ln(x_i) in rank order, subtract k·ln(x_{k+1}) at the end —
    # algebraically identical to summing ln(x_i/x_{k+1}) but keeps the
    # fold terms independent of the (aggregated) threshold
    folded = F.aggregate(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("__rk") <= k,
                    F.struct(F.col("__rk").alias("rk"),
                             F.log("__absr").alias("t")),
                )
            )
        ),
        F.lit(0.0),
        lambda acc, x: acc + x["t"],
    )
    agg = ranked.groupBy(*by).agg(
        F.count(F.lit(1)).alias("__n"),
        F.min("__absr").alias("__xk1"),
        folded.alias("__logsum"),
    )
    xi = (F.col("__logsum") - k * F.log("__xk1")) / F.lit(float(k))
    return (
        agg.filter(F.col("__n") >= k + 1)
        .withColumn("hill_xi", xi)
        .withColumn("tail_alpha", 1.0 / xi)
        .withColumn("k", F.lit(k))
        .drop("__n", "__xk1", "__logsum")
    )


def permutation_entropy(
    df: DataFrame,
    col: str = "close",
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> DataFrame:
    """Order-3 permutation entropy (Bandt–Pompe) of a series.

    Each consecutive triple maps to its ordinal pattern via three raw
    comparisons — code = 4·(x₀<x₁) + 2·(x₁<x₂) + (x₀<x₂), strict
    less-than so ties resolve identically in every engine (two of the
    eight codes are logically impossible).  H = −Σ p·ln p over the
    pattern distribution, normalized by ln 6; ≈1 for white noise,
    lower for any serial structure — a model-free randomness gate
    next to ``variance_ratio``.  One lead window + one pattern-count
    aggregate + an order-deterministic fold over ≤8 groups.
    """
    import math

    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts)
    x0, x1, x2 = F.col(col), F.lead(col, 1).over(w), F.lead(col, 2).over(w)
    code = (
        (x0 < x1).cast("int") * 4
        + (x1 < x2).cast("int") * 2
        + (x0 < x2).cast("int")
    )
    counts = (
        df.withColumn("__code", code)
        .filter(F.col("__code").isNotNull())
        .groupBy(*by, "__code")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    tot = Window.partitionBy(*by)
    p = F.col("__c") / F.sum("__c").over(tot)
    terms = counts.withColumn("__term", -p * F.log(p)).withColumn(
        "__n", F.sum("__c").over(tot)
    )
    folded = F.aggregate(
        F.array_sort(
            F.collect_list(F.struct(F.col("__code"), F.col("__term")))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x["__term"],
    )
    return terms.groupBy(*by).agg(
        F.first("__n").alias("n_windows"),
        (folded / F.lit(math.log(6.0))).alias("perm_entropy"),
    )


_KST_PARAMS = ((10, 10, 1.0), (15, 10, 2.0), (20, 10, 3.0), (30, 15, 4.0))


def kst(
    df: DataFrame,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> DataFrame:
    """Know Sure Thing (Pring): Σ wᵢ · SMA(ROC(rocᵢ), smaᵢ) over the
    standard four legs ``_KST_PARAMS`` + a 9-bar signal SMA.

    Each ROC leg is a lag window; each smoothing is a count-guarded
    rolling mean; the composite and its signal stage as two more
    window columns — six windows total, one per-symbol sort, all
    codegen.  The composite is null until every leg's smoothing
    window is full (so the signal's head matches pandas' NaN
    propagation), and the signal needs 9 non-null composites.
    """
    by = list(by)
    out = df
    legs = []
    for i, (roc_n, sma_n, wgt) in enumerate(_KST_PARAMS):
        roc_c = 100.0 * (
            F.col("close") / lag_col("close", by, ts, offset=roc_n) - 1.0
        )
        out = out.withColumn(f"__roc{i}", roc_c)
        legs.append(
            F.lit(wgt) * sma(f"__roc{i}", sma_n, by=by, ts=ts)
        )
    composite = legs[0]
    for leg in legs[1:]:
        composite = composite + leg
    out = out.withColumn("kst", composite)
    out = out.withColumn("kst_signal", sma("kst", 9, by=by, ts=ts))
    return out.drop(*[f"__roc{i}" for i in range(len(_KST_PARAMS))])


def theil_sen_mann_kendall(
    daily: DataFrame,
    col: str = "close",
    by: list[str] = ("symbol",),
    ts: str = "day",
) -> DataFrame:
    """Theil–Sen slope + Mann–Kendall trend test on a DAILY series.

    Sen's slope is the median of all pairwise slopes — the 29%-
    breakdown robust trend estimate OLS isn't — and Mann–Kendall's
    S = Σ_{i<j} sign(xⱼ − xᵢ) gives the distribution-free trend
    z-test (no-ties variance n(n−1)(2n+5)/18; prices are continuous).
    The self-join runs on the per-day AGGREGATE frame, O(groups ×
    days²) with days bounded per window — never on raw bars.  S is an
    exact integer sum; the median is the exact interpolated quantile;
    z applies the standard ±1 continuity correction.
    """
    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts)
    d = daily.withColumn("__rn", F.row_number().over(w)).select(
        *by, "__rn", F.col(col).alias("__x")
    )
    a, b = d.alias("a"), d.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in by] + [
        F.col("a.__rn") < F.col("b.__rn")
    ]
    pairs = a.join(b, cond).select(
        *[F.col(f"a.{c}") for c in by],
        (
            (F.col("b.__x") - F.col("a.__x"))
            / (F.col("b.__rn") - F.col("a.__rn")).cast("double")
        ).alias("__slope"),
        F.signum(F.col("b.__x") - F.col("a.__x"))
        .cast("long")
        .alias("__sgn"),
    )
    n_days = daily.groupBy(*by).agg(F.count(F.lit(1)).alias("n_days"))
    agg = pairs.groupBy(*by).agg(
        F.percentile("__slope", 0.5).alias("sen_slope"),
        F.sum("__sgn").alias("s_stat"),
    )
    out = agg.join(n_days, by)
    n = F.col("n_days").cast("double")
    var_s = n * (n - 1.0) * (2.0 * n + 5.0) / 18.0
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1.0) / F.sqrt(var_s))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1.0) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return out.withColumn("mk_z", z).withColumn(
        "trend",
        F.when(F.col("mk_z") > 1.959964, F.lit("up"))
        .when(F.col("mk_z") < -1.959964, F.lit("down"))
        .otherwise(F.lit("none")),
    )


def ses_eval(
    daily: DataFrame,
    col: str = "close",
    alpha: float = 0.3,
    by: list[str] = ("symbol",),
    ts: str = "day",
) -> DataFrame:
    """Simple-exponential-smoothing one-step forecast + error report.

    s₁ = x₁, s_t = (1−α)·s_{t−1} + α·x_t; the forecast for t is
    s_{t−1}, so errors are genuinely out-of-sample at every step.
    Emits per group: MAE, RMSE, the naive (random-walk) MAE, and
    MASE = MAE/MAE_naive — the scale-free skill score (<1 beats the
    naive forecast).  The smoothing state is the same seeded
    bounded-array fold as :func:`ema_truncated`, here over the FULL
    per-group prefix (the input is a daily aggregate frame, so the
    array is bounded by the calendar, not by fact rows).
    """
    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts)
    wfull = w.rowsBetween(Window.unboundedPreceding, 0)
    arr = F.collect_list(F.col(col).cast("double")).over(wfull)
    tail = F.slice(arr, F.lit(2), F.greatest(F.size(arr) - 1, F.lit(0)))
    s = F.aggregate(
        tail,
        F.element_at(arr, 1),
        lambda acc, x: acc * F.lit(1.0 - alpha) + F.lit(alpha) * x,
    )
    staged = (
        daily.withColumn("__s", s)
        .withColumn("__fc", F.lag("__s").over(w))
        .withColumn("__prev", F.lag(col).over(w))
        .filter(F.col("__fc").isNotNull())
        .withColumn("__err", F.col(col) - F.col("__fc"))
        .withColumn("__nerr", F.col(col) - F.col("__prev"))
    )
    return staged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.avg(F.abs(F.col("__err"))).alias("mae"),
        F.sqrt(F.avg(F.col("__err") * F.col("__err"))).alias("rmse"),
        F.avg(F.abs(F.col("__nerr"))).alias("naive_mae"),
        (
            F.avg(F.abs(F.col("__err"))) / F.avg(F.abs(F.col("__nerr")))
        ).alias("mase"),
    )


def ultimate_oscillator(
    p1: int = 7,
    p2: int = 14,
    p3: int = 28,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> Column:
    """Ultimate Oscillator (Larry Williams 1976): buying pressure
    BP = close − min(low, prev_close) against the true range
    TR = max(high, prev_close) − min(low, prev_close), blended at
    three horizons: 100·(4·A(p1) + 2·A(p2) + A(p3)) / 7 with
    A(n) = ΣBP(n) / ΣTR(n).

    Three rolling-sum pairs over ONE per-symbol sort (the windows
    share the sort order, so Spark plans a single Window exec chain);
    null until the longest horizon has p3 non-null (BP, TR) pairs and
    whenever a TR sum is zero (flat market). All codegen."""
    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts)
    pc = F.lag("close").over(w)
    bp = F.col("close") - F.least(F.col("low"), pc)
    tr = F.greatest(F.col("high"), pc) - F.least(F.col("low"), pc)

    def avg_n(n: int) -> Column:
        win = w.rowsBetween(-(n - 1), 0)
        s_tr = F.sum(tr).over(win)
        gate = (F.count(bp).over(win) >= n) & (s_tr > 0)
        return F.when(gate, F.sum(bp).over(win) / s_tr)

    return (
        100.0
        * (4.0 * avg_n(p1) + 2.0 * avg_n(p2) + avg_n(p3))
        / 7.0
    )


def chande_momentum(
    n: int = 14,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> Column:
    """Chande Momentum Oscillator: 100·(ΣG − ΣL)/(ΣG + ΣL) over the
    trailing n one-bar diffs, where G/L split the diff by sign.
    Unlike RSI it keeps the raw sums unsmoothed, so it is a pure pair
    of rolling sums — no recurrence, no seed. Null until n non-null
    diffs exist or when the market is perfectly flat (ΣG + ΣL = 0)."""
    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts)
    d = F.col("close") - F.lag("close").over(w)
    win = w.rowsBetween(-(n - 1), 0)
    g = F.sum(F.greatest(d, F.lit(0.0))).over(win)
    l = F.sum(F.greatest(-d, F.lit(0.0))).over(win)
    gate = (F.count(d).over(win) >= n) & ((g + l) > 0)
    return F.when(gate, 100.0 * (g - l) / (g + l))


def detrended_price(
    n: int = 20,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> Column:
    """Detrended Price Oscillator: close from (n/2 + 1) bars ago minus
    the current n-bar SMA — centering the moving average removes the
    trend and leaves the cycle component. One lag + one rolling mean
    over the shared per-symbol sort; null until both the n-bar window
    is full and the centered lag exists."""
    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts)
    shift = n // 2 + 1
    win = w.rowsBetween(-(n - 1), 0)
    lagged = F.lag("close", shift).over(w)
    gate = (F.count("close").over(win) >= n) & lagged.isNotNull()
    return F.when(gate, lagged - F.avg("close").over(win))


def weighted_ma(
    col: str | Column,
    n: int,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
) -> Column:
    """Linearly-weighted moving average: Σ i·x_i / Σ i with weight 1 on
    the oldest and n on the newest bar of the trailing window.

    Implemented as a bounded collect_list + zip_with(sequence) fold so
    the summation ORDER is pinned (oldest→newest) — the DuckDB twin
    (list(...) OVER + list_reduce over the same zip) replays it
    element-identically, which an unordered windowed sum would not
    guarantee. Null until the window holds n values. NOTE: the source
    column must be non-null on every input row (collect_list drops
    nulls, DuckDB list() keeps them) — pre-filter null rows first."""
    c = F.col(col) if isinstance(col, str) else col
    win = Window.partitionBy(*list(by)).orderBy(ts).rowsBetween(-(n - 1), 0)
    xs = F.collect_list(c.cast("double")).over(win)
    weighted = F.zip_with(
        xs,
        F.sequence(F.lit(1), F.size(xs)),
        lambda x, i: x * i.cast("double"),
    )
    denom = F.lit(n * (n + 1) / 2.0)
    return F.when(
        F.size(xs) >= n,
        F.aggregate(weighted, F.lit(0.0), lambda a, x: a + x) / denom,
    )


def holt_eval(
    daily: DataFrame,
    col: str = "close",
    alpha: float = 0.3,
    beta: float = 0.1,
    by: list[str] = ("symbol",),
    ts: str = "day",
) -> DataFrame:
    """Holt linear-trend (double exponential smoothing) one-step
    forecast + error report — :func:`ses_eval` with a trend state:

        l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1},  l_1 = x_1, b_1 = 0

    and the forecast for t is l_{t−1} + b_{t−1} (out-of-sample at
    every step). The COUPLED two-variable recurrence folds as a
    STRUCT-state aggregate over the per-group prefix: each element is
    lifted to {'l': x, 'b': 0}, the seed is the first element, and the
    merge recomputes new_l inline in both fields. Bounded by the
    calendar (daily frame), not fact rows. Emits MAE/RMSE, naive MAE
    and MASE per group.

    Oracle note: DuckDB's ``list_reduce`` struct lambdas evaluate
    fields SEQUENTIALLY, mutating the accumulator in place (the 'b'
    field would see the already-updated 'l'), so the SQL twin replays
    the recurrence as a recursive CTE stepping day rank instead
    (the ``parabolic_sar`` device) — Spark's ``aggregate`` evaluates
    the whole struct against the pre-step accumulator, matching the
    textbook recurrence exactly (differential-tested in
    tests/test_resample_indicators.py).
    """
    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts)
    wfull = w.rowsBetween(Window.unboundedPreceding, 0)
    one_a = 1.0 - alpha
    one_b = 1.0 - beta
    arr = F.collect_list(F.col(col).cast("double")).over(wfull)
    lifted = F.transform(
        F.slice(arr, F.lit(2), F.greatest(F.size(arr) - 1, F.lit(0))),
        lambda x: F.struct(x.alias("l"), F.lit(0.0).alias("b")),
    )
    seed = F.struct(
        F.element_at(arr, 1).alias("l"), F.lit(0.0).alias("b")
    )

    def step(acc, e):
        new_l = F.lit(alpha) * e["l"] + F.lit(one_a) * (acc["l"] + acc["b"])
        new_b = (
            F.lit(beta) * (new_l - acc["l"]) + F.lit(one_b) * acc["b"]
        )
        return F.struct(new_l.alias("l"), new_b.alias("b"))

    st = F.aggregate(lifted, seed, step)
    staged = (
        daily.withColumn("__lv", st["l"])
        .withColumn("__tr", st["b"])
        .withColumn("__fc", F.lag(F.col("__lv") + F.col("__tr")).over(w))
        .withColumn("__prev", F.lag(col).over(w))
        .filter(F.col("__fc").isNotNull())
        .withColumn("__err", F.col(col) - F.col("__fc"))
        .withColumn("__nerr", F.col(col) - F.col("__prev"))
    )
    return staged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.avg(F.abs(F.col("__err"))).alias("mae"),
        F.sqrt(F.avg(F.col("__err") * F.col("__err"))).alias("rmse"),
        F.avg(F.abs(F.col("__nerr"))).alias("naive_mae"),
        (
            F.avg(F.abs(F.col("__err"))) / F.avg(F.abs(F.col("__nerr")))
        ).alias("mase"),
    )
