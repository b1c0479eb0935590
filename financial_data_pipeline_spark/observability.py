"""Zero-extra-pass pipeline metrics via ``DataFrame.observe``.

The reference instruments its pipeline with ``len(df)`` logging after
every stage (``crypto_pipeline.py`` progress prints) — each one a full
extra pass in Spark terms. ``observe`` attaches named aggregate
metrics to a plan node; they are computed AS A SIDE EFFECT of whatever
action already runs the plan (accumulator-style, map-side), so a
10-stage pipeline reports 10 stages' row counts and quality counters
for the price of the one action it was already going to run. At
100 TB, "count each intermediate once more" is the difference between
one scan and eleven.

Batch: ``pyspark.sql.Observation`` (the public Python API — ``get``
blocks until the first action over the observed plan completes).
Streaming: the same ``df.observe(name, ...)`` calls surface per-batch
under ``StreamingQueryProgress.observedMetrics`` — nothing to change.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


class PipelineMetrics:
    """A named set of observation points over one pipeline plan.

    Usage::

        pm = PipelineMetrics()
        df = pm.observe(raw, "ingest")                 # rows
        df = pm.counters(clean(df), "cleaned", ["v"])  # rows + null counts
        df.write...                                    # ONE action
        pm.get("ingest")["rows"]                       # no extra job ran

    Each point is a ``pyspark.sql.Observation``; ``get`` blocks until
    the action that executed the observed plan delivers the metrics.
    An Observation is single-use per action — build a fresh
    ``PipelineMetrics`` per pipeline run (same lifetime as the plan).
    """

    def __init__(self) -> None:
        self._points: dict[str, Observation] = {}

    def observe(self, df: DataFrame, name: str, *metrics: Column) -> DataFrame:
        """Attach named metrics (default: row count) at this plan point."""
        if name in self._points:
            raise ValueError(f"duplicate observation point {name!r}")
        if not metrics:
            metrics = (F.count(F.lit(1)).alias("rows"),)
        obs = Observation(name)
        self._points[name] = obs
        return df.observe(obs, *metrics)

    def counters(
        self, df: DataFrame, name: str, null_cols: list[str]
    ) -> DataFrame:
        """The reference's per-stage log line as one observation: rows +
        per-column null counts — free at action time."""
        metrics = [F.count(F.lit(1)).alias("rows")] + [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls")
            for c in null_cols
        ]
        return self.observe(df, name, *metrics)

    def get(self, name: str) -> dict:
        """Metrics for one point (blocks until its action completes)."""
        return dict(self._points[name].get)

    def all(self) -> dict[str, dict]:
        return {name: dict(o.get) for name, o in self._points.items()}
