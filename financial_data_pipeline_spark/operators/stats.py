"""Aggregations / statistics / quality metrics (SURVEY.md §2.4, §2.6).

A3 symbol stats, A4 latest-timestamp cursor, A5 date range, A9 null
counts, A10 interval mode, A11 weighted quality score, A13 group
counts / greatest-per-group. All single-pass ``groupBy().agg`` plans
with map-side partial aggregation; nothing here needs more than one
shuffle on its grouping key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from financial_data_pipeline_spark.schema import OHLCV_COLUMNS, PRICE_COLUMNS


def symbol_stats(df: DataFrame, by: list[str] = ("symbol",)) -> DataFrame:
    """Per-symbol summary (``timeseries_db.py:349-397``,
    ``postgresql_storage.py:156-197``): count, first/last timestamp,
    min/max/avg close, total volume."""
    return df.groupBy(*by).agg(
        F.count(F.lit(1)).alias("record_count"),
        F.min("timestamp").alias("first_timestamp"),
        F.max("timestamp").alias("last_timestamp"),
        F.min("close").alias("min_close"),
        F.max("close").alias("max_close"),
        F.avg("close").alias("avg_close"),
        F.sum("volume").alias("total_volume"),
    )


def latest_timestamp(df: DataFrame, symbol: str) -> "object":
    """Incremental-ingest cursor (``timeseries_db.py:313-347``)."""
    row = df.filter(F.col("symbol") == symbol).agg(F.max("timestamp")).first()
    return row[0] if row else None


def date_range(df: DataFrame, ts: str = "timestamp") -> tuple:
    """Global min/max timestamp (``enhanced_metadata_manager.py:174-189``)."""
    row = df.agg(F.min(ts), F.max(ts)).first()
    return (row[0], row[1]) if row else (None, None)


def null_counts(df: DataFrame, cols: list[str] | None = None) -> dict[str, int]:
    """Per-column + total null counts in ONE pass (``data_cleaner.py:120,162``)."""
    cols = cols or df.columns
    row = df.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
    ).first()
    out = {c: int(row[c] or 0) for c in cols}
    out["__total__"] = sum(out.values())
    return out


def interval_mode(
    df: DataFrame, by: list[str] = ("symbol",), ts: str = "timestamp"
) -> DataFrame:
    """Most common inter-row interval (seconds) + irregular count per
    group (A10, ``data_cleaner.py:323-337``). Ties break on the smaller
    interval (numpy ``argmax`` keeps the first of a sorted-unique array).
    """
    by = list(by)
    w = Window.partitionBy(*by).orderBy(ts)
    iv = (
        df.withColumn(
            "__iv", (F.unix_micros(F.col(ts)) - F.unix_micros(F.lag(ts).over(w))) / 1e6
        )
        .filter(F.col("__iv").isNotNull())
    )
    # One pass over the facts: the irregular count is derivable from
    # the per-interval counts alone (total intervals − mode count), so
    # there is no join back onto the fact frame — the earlier version
    # forked the lag-window pass into two branches and re-ran it.
    counts = iv.groupBy(*by, "__iv").count()
    wmode = Window.partitionBy(*by).orderBy(F.desc("count"), F.asc("__iv"))
    wtot = Window.partitionBy(*by)
    return (
        counts.withColumn("__rn", F.row_number().over(wmode))
        .withColumn("__tot", F.sum("count").over(wtot))
        .filter(F.col("__rn") == 1)
        .select(
            *by,
            F.col("__iv").alias("most_common_interval_seconds"),
            (F.col("__tot") - F.col("count")).alias("irregular_intervals"),
        )
    )


def quality_score_expr(expected_interval_seconds: int = 60) -> list[Column]:
    """The four A11 component fractions (``data_validator.py:135-186``)
    as aggregate expressions over a frame that already has ``__iv``
    (interval seconds, null on each group's first row):

    completeness (non-null fraction over OHLCV cells), OHLC validity,
    temporal continuity (interval <= expected), positive volume.
    """
    cells = [F.col(c) for c in OHLCV_COLUMNS]
    n = F.count(F.lit(1))
    completeness = 1.0 - sum(
        F.sum(c.isNull().cast("double")) for c in cells
    ) / (n * len(cells))
    h, l, o, c = (F.col(x) for x in ("high", "low", "open", "close"))
    ohlc_valid = F.avg(
        ((h >= l) & (o >= l) & (o <= h) & (c >= l) & (c <= h)).cast("double")
    )
    continuity = (
        F.sum((F.col("__iv") <= expected_interval_seconds).cast("double")) / n
    )
    vol_valid = F.avg((F.col("volume") > 0).cast("double"))
    return [
        completeness.alias("completeness"),
        ohlc_valid.alias("ohlc_valid"),
        continuity.alias("temporal_continuity"),
        vol_valid.alias("volume_valid"),
        (
            completeness * 0.3 + ohlc_valid * 0.3 + continuity * 0.2 + vol_valid * 0.2
        ).alias("quality_score"),
    ]


def quality_score(
    df: DataFrame,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
    expected_interval_seconds: int = 60,
) -> DataFrame:
    """Weighted quality score per group, weights .3/.3/.2/.2 (A11)."""
    by = [c for c in list(by) if c in df.columns]
    w = Window.partitionBy(*by).orderBy(ts)
    with_iv = df.withColumn(
        "__iv", (F.unix_micros(F.col(ts)) - F.unix_micros(F.lag(ts).over(w))) / 1e6
    )
    return with_iv.groupBy(*by).agg(*quality_score_expr(expected_interval_seconds))


def greatest_per_group(
    df: DataFrame, keys: list[str], order_col: str
) -> DataFrame:
    """Latest-row-per-group (A13 ``MAX(id) GROUP BY`` pattern,
    ``metadata_db.py:517-530``) via a rank window — one shuffle."""
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def zero_extreme_counts(
    df: DataFrame,
    by: list[str] = ("symbol",),
    ts: str = "timestamp",
    extreme_threshold: float = 0.2,
) -> DataFrame:
    """P11 report counters per group in one pass: zero-price rows, zero-
    volume rows, extreme close-to-close moves (> threshold), time gaps
    (> 6× median interval) (``data_cleaner.py:271-285,343-398``)."""
    by = [c for c in list(by) if c in df.columns]
    w = Window.partitionBy(*by).orderBy(ts)
    iv = (F.unix_micros(F.col(ts)) - F.unix_micros(F.lag(ts).over(w))) / 1e6
    chg = F.abs(F.col("close") / F.lag("close").over(w) - 1.0)
    base = df.withColumns({"__iv": iv, "__chg": chg})
    med = base.groupBy(*by).agg(F.median("__iv").alias("__med_iv"))
    base = base.join(F.broadcast(med), on=by) if by else base.crossJoin(F.broadcast(med))
    zero_price = F.greatest(*[(F.col(c) == 0).cast("int") for c in PRICE_COLUMNS])
    return base.groupBy(*by).agg(
        F.sum(zero_price.cast("long")).alias("zero_price_rows"),
        F.sum((F.col("volume") == 0).cast("long")).alias("zero_volume_rows"),
        F.sum((F.col("__chg") > extreme_threshold).cast("long")).alias(
            "extreme_price_changes"
        ),
        F.sum((F.col("__iv") > 6 * F.col("__med_iv")).cast("long")).alias("time_gaps"),
        F.count(F.lit(1)).alias("valid_records"),
    )


def status_report(df: DataFrame, by: list[str] = ("symbol",)) -> DataFrame:
    """Per-symbol status summary (``pipeline_status_report.py:96-131``):
    records, earliest/latest timestamp, min/max close, avg volume —
    the exact column set the reference's report query emits, one
    grouped pass, ordered by symbol for display parity."""
    by = list(by)
    return (
        df.groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("records"),
            F.min("timestamp").alias("earliest"),
            F.max("timestamp").alias("latest"),
            F.min("close").alias("min_price"),
            F.max("close").alias("max_price"),
            F.avg("volume").alias("avg_volume"),
        )
        .orderBy(*by)
    )


def query_ohlcv(
    df: DataFrame,
    symbol: str | None = None,
    start=None,
    end=None,
    limit: int | None = None,
    ts: str = "timestamp",
) -> DataFrame:
    """E3 read-side query (``timeseries_db.py:252-311``): symbol +
    time-range predicates, newest-first, optional LIMIT.

    Over the parquet lake the predicates push down to the scan and
    ``orderBy(desc).limit(n)`` executes as a distributed top-k
    (TakeOrderedAndProject) — no global sort materializes (O2).
    """
    out = df
    if symbol is not None:
        out = out.filter(F.col("symbol") == symbol)
    if start is not None:
        out = out.filter(F.col(ts) >= F.lit(start).cast("timestamp"))
    if end is not None:
        out = out.filter(F.col(ts) <= F.lit(end).cast("timestamp"))
    out = out.orderBy(F.col(ts).desc())
    if limit is not None:
        out = out.limit(limit)
    return out


def welch_t_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Welch's unequal-variance t-test between two groups — the A/B
    experiment readout as ONE grouped aggregate + a one-row crossJoin
    (no scipy, closed forms only): t statistic and Welch–Satterthwaite
    degrees of freedom. The p-value needs the t CDF (caller-side
    scipy/table territory); at experiment scale df is huge and |t|>1.96
    is the 5% line."""
    agg = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .groupBy(group_col)
        .agg(
            F.avg(value_col).alias("m"),
            F.var_samp(value_col).alias("v"),
            F.count(value_col).alias("n"),
        )
    )
    a = agg.filter(F.col(group_col) == group_a).select(
        F.col("m").alias("mean_a"), F.col("v").alias("__va"), F.col("n").alias("n_a")
    )
    b = agg.filter(F.col(group_col) == group_b).select(
        F.col("m").alias("mean_b"), F.col("v").alias("__vb"), F.col("n").alias("n_b")
    )
    j = a.crossJoin(b)
    sa = F.col("__va") / F.col("n_a")
    sb = F.col("__vb") / F.col("n_b")
    return j.select(
        F.lit(group_a).alias("group_a"),
        F.lit(group_b).alias("group_b"),
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        ((F.col("mean_a") - F.col("mean_b")) / F.sqrt(sa + sb)).alias("t_stat"),
        (
            (sa + sb) * (sa + sb)
            / (sa * sa / (F.col("n_a") - 1) + sb * sb / (F.col("n_b") - 1))
        ).alias("welch_df"),
    )


def _avg_rank(value: Column, by: list[str]) -> Column:
    """Fractional (average) rank of ``value`` within ``by`` — the
    tie-correct rank statistics use: min-rank + (ties − 1)/2."""
    o = Window.partitionBy(*by).orderBy(value)
    ties = Window.partitionBy(*by, value)
    return F.rank().over(o) + (F.count(F.lit(1)).over(ties) - 1) / 2.0


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    by: list[str] = (),
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) between two groups, the
    rank-based companion of :func:`welch_t_test` (no normality
    assumption; detects stochastic dominance).

    U_a = R_a − n_a(n_a+1)/2 from pooled average ranks; z uses the
    tie-corrected variance  n_a·n_b/12 · ((n+1) − Σ(t³−t)/(n(n−1)))
    and a ±0.5 continuity correction; two-sided p from the normal
    tail via the Abramowitz–Stegun 7.1.26 erfc polynomial (|ε|<1.5e-7)
    — a pure closed form both engines evaluate identically.

    Plan: one rank window over the pooled rows (one shuffle on
    ``by``), a tie aggregate, then a one-row (per key) combine.
    """
    by = list(by)
    g = F.col(group_col)
    pooled = df.filter(g.isin([group_a, group_b])).select(
        *by,
        g.alias("__g"),
        F.col(value_col).alias("__v"),
    )
    ranked = pooled.withColumn("__r", _avg_rank(F.col("__v"), by))
    # per-distinct-value tie sizes for the variance correction
    agg = ranked.groupBy(*by).agg(
        F.sum(F.when(F.col("__g") == group_a, F.col("__r"))).alias("__ra"),
        F.sum(F.when(F.col("__g") == group_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("__g") == group_b, 1).otherwise(0)).alias("n_b"),
    )
    ties = (
        pooled.groupBy(*by, "__v")
        .agg(F.count(F.lit(1)).alias("__t"))
        .groupBy(*by)
        .agg(
            F.sum(
                F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t")
            ).alias("__tie3")
        )
    )
    j = agg.join(ties, on=by) if by else agg.crossJoin(ties)
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    n = na + nb
    u_a = F.col("__ra") - na * (na + 1.0) / 2.0
    mu = na * nb / 2.0
    var = na * nb / 12.0 * ((n + 1.0) - F.col("__tie3") / (n * (n - 1.0)))
    # continuity correction toward the mean
    z = (u_a - mu - F.when(u_a > mu, 0.5).when(u_a < mu, -0.5).otherwise(0.0)) / F.sqrt(var)
    az = F.abs(z) / F.sqrt(F.lit(2.0))  # normal 2-sided p = erfc(|z|/√2)
    t = 1.0 / (1.0 + 0.3275911 * az)
    erfc = (
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
    return j.select(
        *by,
        "n_a",
        "n_b",
        u_a.alias("u_a"),
        z.alias("z"),
        F.least(F.lit(1.0), erfc).alias("p_value"),
    )


def benford_digit_test(
    df: DataFrame,
    value_col: str,
    by: list[str] = (),
) -> DataFrame:
    """Benford's-law first-significant-digit test — the standard
    screen for fabricated or manipulated numeric columns (volumes,
    trade sizes, invoice amounts).

    First digit d of |x| extracted arithmetically:
    floor(|x| / 10^floor(log10 |x|)) — no string cast in the hot
    path. χ² = n·Σ (p̂_d − p_d)²/p_d against expected
    p_d = log10(1 + 1/d); its 8-df survival has the even-df closed
    form exp(−x/2)·Σ_{j<4} (x/2)^j/j!, so the p-value is exact and
    engine-portable. One groupBy(by, digit) + one combine.
    """
    by = list(by)
    x = F.abs(F.col(value_col))
    digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))).cast("int")
    counted = (
        df.filter(x > 0)
        .select(*by, digit.alias("digit"))
        .groupBy(*by, "digit")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    expected = F.log10(1.0 + 1.0 / F.col("digit").cast("double"))
    # total-n rides in on a window over the (≤9 per key) digit rows so
    # the deviation sum is a plain aggregate, not a nested window
    per = counted.withColumns(
        {"__p": expected, "__n": F.sum("c").over(Window.partitionBy(*by))}
    )
    agg = per.groupBy(*by).agg(
        F.first("__n").alias("n"),
        F.sum(
            F.pow(F.col("c") / F.col("__n") - F.col("__p"), 2) / F.col("__p")
        ).alias("__dev"),
        F.sum("__p").alias("__pmass"),
    )
    # digits absent from the sample still contribute (0−p)²/p = p;
    # Σ_d p_d = 1, so the missing mass is 1 − Σ_present p — no
    # domain join needed
    chi2 = F.col("n") * (F.col("__dev") + (1.0 - F.col("__pmass")))
    h = chi2 / 2.0
    # survival of chi-square with 8 df: exp(-h) * sum_{j=0..3} h^j / j!
    sf = F.exp(-h) * (
        1.0 + h + h * h / 2.0 + h * h * h / 6.0
    )
    return agg.select(
        *by,
        "n",
        F.round(chi2, 6).alias("chi2"),
        F.round(sf, 6).alias("p_value"),
    )


def value_at_risk(
    df: DataFrame,
    return_col: str,
    by: list[str] = ("symbol",),
    levels: tuple = (0.95, 0.99),
) -> DataFrame:
    """Historical VaR and CVaR (expected shortfall) per key at the
    given confidence levels, from the empirical return distribution.

    VaR_α = −quantile(r, 1−α) (loss sign convention, so a positive
    number is a loss); CVaR_α = −E[r | r ≤ quantile(r, 1−α)] — the
    coherent tail mean that Basel/FRTB moved to. One aggregate per
    key: exact ``percentile`` plus conditional means against the
    same quantile via a second pass over the already-grouped rows
    (a self-join-free two-stage agg: quantiles first, broadcast
    back, tail means second). Swap ``percentile_approx`` at 100 TB
    (same contract as ``length_percentiles``).
    """
    by = list(by)
    r = F.col(return_col)
    qaggs = []
    for lv in levels:
        tag = str(int(lv * 100))
        qaggs.append(
            F.percentile(r, F.lit(1.0 - lv)).alias(f"__q{tag}")
        )
    quants = df.groupBy(*by).agg(*qaggs)
    j = df.join(F.broadcast(quants), on=by)
    aggs = [F.count(F.lit(1)).alias("n_obs")]
    for lv in levels:
        tag = str(int(lv * 100))
        q = F.col(f"__q{tag}")
        aggs.append(F.max(-q).alias(f"var_{tag}"))
        aggs.append(
            (-F.avg(F.when(r <= q, r))).alias(f"cvar_{tag}")
        )
    return j.groupBy(*by).agg(*aggs)


def cuped_adjustment(
    df: DataFrame,
    metric_col: str,
    covariate_col: str,
    by: list[str] = (),
) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM'13) — the standard
    pre-experiment-covariate adjustment an experimentation stack runs
    before :func:`welch_t_test`: ŷ = y − θ·(x − x̄) with
    θ = cov(x, y)/var(x) cuts metric variance by the squared
    correlation, shrinking required sample sizes.

    One grouped aggregate computes θ, both means and both variances in
    closed form (var_adj = var_y·(1 − ρ²) — no second pass over the
    rows is needed at all); per-key output row carries θ and the
    realized variance-reduction fraction. Rows missing either value
    are excluded (CUPED needs the pair).
    """
    by = list(by)
    y, x = F.col(metric_col), F.col(covariate_col)
    d = df.filter(y.isNotNull() & x.isNotNull())
    rho2 = F.pow(F.corr(x, y), 2)
    return d.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        (F.covar_samp(x, y) / F.var_samp(x)).alias("theta"),
        F.avg(y).alias("mean_metric"),
        F.var_samp(y).alias("var_raw"),
        (F.var_samp(y) * (1.0 - rho2)).alias("var_adj"),
        rho2.alias("variance_reduction"),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan–Meier survival estimator from (duration, event) pairs —
    the churn/retention curve: S(t) = Π_{t_i ≤ t} (1 − d_i/n_i) with
    d_i events and n_i at-risk at each distinct event time (censored
    rows leave the risk set but never drop S).

    Distributed closed form: one groupBy(duration) reduces to
    per-time (d, c) counts; the at-risk count n_i is a suffix sum
    (descending cumulative window) and the product telescopes as
    exp(Σ ln(1 − d/n)) over an ascending cumulative window — two
    window passes over the ALREADY-REDUCED per-time frame, never the
    raw rows. Times with only censoring are kept as rows (flat S,
    standard KM table output).
    """
    d, e = F.col(duration_col), F.col(event_col).cast("int")
    per_t = df.groupBy(d.alias("t")).agg(
        F.sum(e).alias("d"),
        F.sum(1 - e).alias("c"),
    )
    desc = (
        Window.orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    asc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    at_risk = per_t.withColumn(
        "n_risk", F.sum(F.col("d") + F.col("c")).over(desc)
    )
    # d == n_risk (everyone at risk dies) drives a factor of exactly 0;
    # ln(0) is null under non-ANSI Spark and would silently DROP the
    # term from the window sum, so the absorbing state is tracked as
    # its own cumulative flag instead
    hit_zero = F.max((F.col("d") == F.col("n_risk")).cast("int")).over(asc)
    log_terms = F.sum(
        F.when(
            (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
            F.log(1.0 - F.col("d") / F.col("n_risk")),
        ).otherwise(F.lit(0.0))
    ).over(asc)
    return at_risk.withColumn(
        "survival",
        F.when(hit_zero == 1, F.lit(0.0)).otherwise(F.exp(log_terms)),
    ).select("t", "d", "c", "n_risk", "survival")


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    by: list[str] = (),
) -> DataFrame:
    """Gini inequality coefficient of a nonnegative value column
    (customer spend, document length, token share…):
    G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n over ascending-sorted values —
    the revenue-concentration readout next to the heavy-hitter family.

    One rank window per key + one aggregate; ties get distinct ranks
    (row_number), which leaves G invariant because tied values
    contribute a constant regardless of their order.
    """
    by = list(by)
    x = F.col(value_col).cast("double")
    w = Window.partitionBy(*by).orderBy(value_col, F.monotonically_increasing_id())
    ranked = df.filter(x >= 0).withColumn("__i", F.row_number().over(w))
    n = F.count(F.lit(1)).cast("double")
    return ranked.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        (
            2.0 * F.sum(F.col("__i") * x) / (n * F.sum(x))
            - (n + 1.0) / n
        ).alias("gini"),
    )


def chi2_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Pearson χ² test of independence between two categorical
    columns (event type × weekday, segment × priority…) — one row:
    (n, r, c, dof, chi2, p_value).

    One groupBy((a, b)) reduces the facts to observed cells; marginals
    ride windows over that tiny cell frame. Absent cells still owe
    their expected mass: Σ_all e = N, so χ² = Σ_obs (o−e)²/e +
    (N − Σ_obs e) — the same no-domain-join closed form as
    :func:`benford_digit_test`. The survival function has the exact
    even-df closed form exp(−x/2)·Σ_{j<dof/2} (x/2)^j/j! evaluated via
    a ``sequence`` fold with running factorial; odd dof yields a null
    p (the caller picks categories, so dof parity is a design-time
    fact — documented, not hidden).
    """
    a, b = F.col(col_a), F.col(col_b)
    cells = df.filter(a.isNotNull() & b.isNotNull()).groupBy(
        a.alias("__a"), b.alias("__b")
    ).agg(F.count(F.lit(1)).alias("o"))
    wa = Window.partitionBy("__a")
    wb = Window.partitionBy("__b")
    wall = Window.partitionBy()
    per = cells.withColumns(
        {
            "__ra": F.sum("o").over(wa),
            "__cb": F.sum("o").over(wb),
            "__n": F.sum("o").over(wall),
        }
    ).withColumn(
        "__e", F.col("__ra") * F.col("__cb") / F.col("__n").cast("double")
    )
    agg = per.agg(
        F.first("__n").alias("n"),
        F.countDistinct("__a").alias("r"),
        F.countDistinct("__b").alias("c"),
        F.sum(F.pow(F.col("o") - F.col("__e"), 2) / F.col("__e")).alias("__dev"),
        F.sum("__e").alias("__emass"),
    )
    chi2 = F.col("__dev") + (F.col("n") - F.col("__emass"))
    dof = (F.col("r") - 1) * (F.col("c") - 1)
    h = chi2 / 2.0
    # survival for even dof: exp(-h) * sum_{j=0..dof/2-1} h^j / j!
    # folded with a running factorial in the accumulator; dof=2 is the
    # bare j=0 term (sequence(1, 0) would DESCEND in Spark — guarded)
    series = F.aggregate(
        F.sequence(F.lit(1), F.greatest((dof / 2).cast("int") - 1, F.lit(1))),
        F.struct(F.lit(1.0).alias("s"), F.lit(1.0).alias("term")),
        lambda acc, j: F.struct(
            (acc.s + acc.term * h / j.cast("double")).alias("s"),
            (acc.term * h / j.cast("double")).alias("term"),
        ),
        lambda acc: acc.s,
    )
    sf = F.exp(-h) * F.when(dof == 2, F.lit(1.0)).otherwise(series)
    return agg.select(
        "n",
        "r",
        "c",
        dof.alias("dof"),
        chi2.alias("chi2"),
        F.when(dof % 2 == 0, F.least(F.lit(1.0), sf)).alias("p_value"),
        # Cramér's V effect size — the chi2 statistic rescaled to [0,1]
        # so dependence strength reads off independent of sample size
        F.sqrt(
            chi2
            / (
                F.col("n").cast("double")
                * F.least(F.col("r") - 1, F.col("c") - 1)
            )
        ).alias("cramers_v"),
    )


def binary_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by: list[str] = (),
) -> DataFrame:
    """ROC AUC of a score against a binary label via the rank-sum
    identity AUC = (R₁ − n₁(n₁+1)/2) / (n₁·n₀) — the probability a
    random positive outscores a random negative, with ties counted
    half (exactly what fractional average ranks produce). The model-
    eval readout for ``ml_quality.score_quality`` and any heuristic
    quality score, sharing :func:`mann_whitney_u`'s machinery (AUC and
    U are the same statistic on different scales).

    One rank window over the pooled rows + one aggregate per key.
    """
    by = list(by)
    lbl = F.col(label_col).cast("int")
    ranked = df.select(
        *by, lbl.alias("__y"), F.col(score_col).alias("__s")
    ).withColumn("__r", _avg_rank(F.col("__s"), by))
    agg = ranked.groupBy(*by).agg(
        F.sum(F.when(F.col("__y") == 1, F.col("__r"))).alias("__r1"),
        F.sum(F.col("__y")).alias("n_pos"),
        F.sum(1 - F.col("__y")).alias("n_neg"),
    )
    n1 = F.col("n_pos").cast("double")
    return agg.select(
        *by,
        "n_pos",
        "n_neg",
        (
            (F.col("__r1") - n1 * (n1 + 1.0) / 2.0)
            / (n1 * F.col("n_neg"))
        ).alias("auc"),
    )


def wilcoxon_signed_rank(
    df: DataFrame,
    col_a: str,
    col_b: str,
    by: list[str] = (),
) -> DataFrame:
    """Wilcoxon signed-rank test for PAIRED samples (per-user metric
    under two conditions, before/after per entity) — the rank-based
    companion of the paired t, completing the test family next to the
    unpaired :func:`mann_whitney_u`.

    Zero differences drop (Wilcoxon's rule); |d| gets fractional
    average ranks; W+ = Σ ranks of positive d. Normal approximation
    with tie correction: σ² = n(n+1)(2n+1)/24 − Σ(t³−t)/48, continuity
    ±0.5, two-sided p via the shared A-S erfc. One rank window over
    the nonzero pairs + one aggregate per key.
    """
    by = list(by)
    d = (F.col(col_a) - F.col(col_b)).alias("__d")
    nz = df.select(*by, d).filter(F.col("__d") != 0)
    o = Window.partitionBy(*by).orderBy(F.abs(F.col("__d")))
    ties = Window.partitionBy(*by, F.abs(F.col("__d")))
    ranked = nz.withColumn(
        "__r", F.rank().over(o) + (F.count(F.lit(1)).over(ties) - 1) / 2.0
    )
    tie_counts = (
        nz.groupBy(*by, F.abs(F.col("__d")).alias("__ad"))
        .agg(F.count(F.lit(1)).alias("__t"))
        .groupBy(*by)
        .agg(
            F.sum(
                F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t")
            ).alias("__tie3")
        )
    )
    agg = ranked.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("__d") > 0, F.col("__r"))).alias("__wplus"),
    )
    j = agg.join(tie_counts, on=by) if by else agg.crossJoin(tie_counts)
    n = F.col("n_pairs").cast("double")
    w_plus = F.coalesce(F.col("__wplus"), F.lit(0.0))
    mu = n * (n + 1.0) / 4.0
    var = n * (n + 1.0) * (2.0 * n + 1.0) / 24.0 - F.col("__tie3") / 48.0
    z = (
        w_plus
        - mu
        - F.when(w_plus > mu, 0.5).when(w_plus < mu, -0.5).otherwise(0.0)
    ) / F.sqrt(var)
    az = F.abs(z) / F.sqrt(F.lit(2.0))
    t = 1.0 / (1.0 + 0.3275911 * az)
    erfc = (
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
    return j.select(
        *by,
        "n_pairs",
        w_plus.alias("w_plus"),
        z.alias("z"),
        F.least(F.lit(1.0), erfc).alias("p_value"),
    )


def bh_fdr(
    df: DataFrame,
    p_col: str = "p_value",
    q: float = 0.10,
    tie_cols: list[str] = (),
) -> DataFrame:
    """Benjamini–Hochberg FDR control over a hypothesis frame.

    Adds ``bh_rank`` (ascending p, deterministic tiebreak),
    ``p_adj`` (step-up adjusted p: reverse running min of m·p/rank,
    capped at 1) and ``discovery`` (rank ≤ k*, where k* is the largest
    rank with p ≤ q·rank/m).  All three are windows over the
    HYPOTHESIS frame — one row per test, already aggregated — so the
    unpartitioned sort is over m rows, not facts (the same bounded
    GLOBAL_WINDOW contract as the rank-test operators).
    """
    tie_cols = list(tie_cols)
    w_rank = Window.orderBy(F.col(p_col).asc(), *[F.col(c) for c in tie_cols])
    w_all = Window.partitionBy()
    ranked = df.withColumn("bh_rank", F.row_number().over(w_rank)).withColumn(
        "__m", F.count(F.lit(1)).over(w_all)
    )
    raw_adj = F.least(
        F.lit(1.0), F.col("__m") * F.col(p_col) / F.col("bh_rank")
    )
    # reverse running min over the DESC rank order with a preceding
    # frame — unbounded-FOLLOWING aggregate frames are O(m²) in Spark
    # (m is small here, but the linear form costs nothing)
    w_rev = Window.orderBy(F.col("bh_rank").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = ranked.withColumn("p_adj", F.min(raw_adj).over(w_rev))
    passes = F.when(
        F.col(p_col) <= F.lit(q) * F.col("bh_rank") / F.col("__m"),
        F.col("bh_rank"),
    )
    kstar = F.max(passes).over(w_all)
    return ranked.withColumn(
        "discovery",
        F.when(kstar.isNull(), F.lit(False)).otherwise(
            F.col("bh_rank") <= kstar
        ),
    ).drop("__m")
