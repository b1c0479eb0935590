"""CLI front door: ``python -m financial_data_pipeline_spark …``.

The reference ships ``tools/run_pipeline_cli.py`` (argparse over
provider/symbol/timeframe/days-back/store-db/save-files; its body is a
TODO stub). This is the working Spark rendering wired to the real E1
orchestrator: source selection → ``run_pipeline_single`` per symbol →
the result dict printed as one JSON object (machine-consumable, the
same dict the library returns).

Sources:
- ``--source synthetic`` (default): the seeded random-walk generator —
  runnable anywhere, no network, reproducible via ``--seed``;
- ``--source <path>``: a parquet directory holding OHLCV bars with a
  ``symbol`` column (e.g. an archive written by this package);
- the live REST providers stay library-level (they need ``requests``
  and credentials — ``sources/providers.py``), matching the
  reference's posture where the CLI never embedded API keys.

Config: ``--config pipeline.json`` feeds ``PipelineConfig.from_file``
(defaults → env → JSON → CLI overrides, the reference's merge order).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="financial_data_pipeline_spark",
        description="Run the OHLCV pipeline (clean -> features -> split -> sinks)",
    )
    p.add_argument("--config", default=None, help="pipeline JSON config file")
    p.add_argument(
        "--symbol",
        action="append",
        help="symbol(s) to process (repeatable); default from config",
    )
    p.add_argument("--timeframe", default=None, help="bar interval, e.g. 1h")
    p.add_argument("--days-back", type=int, default=7)
    p.add_argument(
        "--source",
        default="synthetic",
        help="'synthetic' or a parquet path with OHLCV bars",
    )
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--output-dir", default=None)
    p.add_argument(
        "--format",
        action="append",
        dest="formats",
        choices=["parquet", "csv", "json"],
        help="output format(s) when --output-dir is set (repeatable)",
    )
    p.add_argument("--split", default=None,
                   choices=["chronological", "random", "by_time"])
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument(
        "--demo",
        action="store_true",
        help="run the worked end-to-end walkthrough (see DEMO.md) and exit",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    if args.demo:
        from financial_data_pipeline_spark.demo import main as demo_main

        return demo_main()

    from financial_data_pipeline_spark import get_spark
    from financial_data_pipeline_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline,
    )

    overrides: dict = {}
    if args.symbol:
        overrides["symbols"] = args.symbol
    if args.timeframe:
        overrides["interval"] = args.timeframe
    if args.output_dir:
        overrides["output_dir"] = args.output_dir
    if args.formats:
        overrides["output_formats"] = args.formats
    if args.split:
        overrides["split_method"] = args.split
    config = PipelineConfig.from_file(args.config, **overrides)

    spark = get_spark(shuffle_partitions=args.shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")

    import datetime as dt

    from pyspark.sql import functions as F

    if args.source == "synthetic":
        from financial_data_pipeline_spark.sources.synthetic import (
            synthetic_ohlcv,
        )

        end = dt.date.today()
        start = end - dt.timedelta(days=args.days_back)
        minutes = {"1m": 1, "5m": 5, "15m": 15, "1h": 60, "4h": 240,
                   "1d": 1440}.get(config.interval, 60)
        bars = synthetic_ohlcv(
            spark,
            config.symbols,
            start.isoformat(),
            end.isoformat(),
            minutes,
            seed=args.seed,
        )
    else:
        bars = spark.read.parquet(args.source)

    sources = {
        s: bars.filter(F.col("symbol") == s).drop("symbol")
        for s in config.symbols
    }
    results = run_pipeline(spark, config, sources)
    print(json.dumps(results, default=str))
    return 0 if all("error" not in r for r in results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
