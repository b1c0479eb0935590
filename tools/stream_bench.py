"""Streaming micro-batch bench (verdict-r5 item 7).

Every streaming component is equivalence-tested against its batch twin,
but a 100 TB design claim wants *measured* micro-batch numbers: rows/s,
state size, batch latency. This tool drives the three stateful
streaming paths over the sf0.1 tables amplified 8× — the same
amplifier recipe as tools/scaling_probe.py — as real Structured
Streaming queries (file source, ``Trigger.AvailableNow``,
``maxFilesPerTrigger`` so the drain is a SEQUENCE of micro-batches,
not one giant batch) and reads the engine's own
``StreamingQueryProgress`` telemetry:

- ``continuous_ohlcv`` — windowed OHLCV rollup with a 3 h watermark
  (the continuous-aggregate refresh analog). State = open (symbol,
  bucket) windows.
- ``dedup_stream`` — ``dropDuplicatesWithinWatermark`` on the 60-bit
  content hash; ~20 % of the amplified docs are planted duplicates
  (collapsed onto 100 template texts) so the drop path does real work.
  State = distinct hashes inside the watermark horizon.
- ``streaming_cusum`` — the ``applyInPandasWithState`` change-point
  monitor, frozen per-symbol reference stats. State = 4 doubles/key.

Inputs are written time-ordered into N parquet files
(``repartitionByRange`` on event time) so the watermark advances
between micro-batches and state actually evicts — a single
out-of-order blob would hold every window open to the end and
overstate state size.

Usage::

    python tools/stream_bench.py [k] [n_files]

Writes STREAMBENCH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"


def build_inputs(spark, k: int, n_files: int, root: str) -> dict[str, str]:
    """Amplified, time-ordered streaming inputs under ``root``."""
    from pyspark.sql import functions as F

    dirs = {n: os.path.join(root, n) for n in ("bars", "docs")}

    # pseudo-bars: each event is a 1-row bar (the tick-grained ingest
    # shape continuous_ohlcv compacts); k copies keep disjoint symbol
    # spaces like scaling_probe (per-key state repeats k×, not hotter)
    copies = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__c")
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    v = F.col("value").cast("double")
    (
        ev.select("*", copies)
        .select(
            F.col("ts").alias("timestamp"),
            F.concat_ws("~", "event_type", F.col("__c")).alias("symbol"),
            v.alias("open"),
            v.alias("high"),
            v.alias("low"),
            v.alias("close"),
            v.alias("volume"),
        )
        .repartitionByRange(n_files, "timestamp")
        .sortWithinPartitions("timestamp")
        .write.mode("overwrite")
        .parquet(dirs["bars"])
    )

    # documents with an event_time spread over the same 30-day span and
    # ~20% planted duplicates (collapsed onto 100 template texts)
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    new_id = F.col("doc_id") + F.col("__c").cast("long") * 10_000_000
    dup = F.pmod(F.xxhash64(F.col("doc_id"), F.col("__c")), F.lit(100)) < 20
    text = F.when(
        dup,
        F.concat(
            F.lit("template duplicate body "),
            F.pmod(F.xxhash64(new_id), F.lit(100)).cast("string"),
        ),
    ).otherwise(F.concat_ws(" ", F.lit("c"), F.col("__c").cast("string"), "text"))
    span_s = 30 * 24 * 3600
    et = F.timestamp_seconds(
        F.lit(1704067200) + F.pmod(F.xxhash64(new_id, F.lit(3)), F.lit(span_s))
    )
    (
        docs.select("*", copies)
        .select(new_id.alias("doc_id"), text.alias("text"), et.alias("event_time"))
        .repartitionByRange(n_files, "event_time")
        .sortWithinPartitions("event_time")
        .write.mode("overwrite")
        .parquet(dirs["docs"])
    )
    return dirs


def drain(result_df, ckpt: str) -> dict:
    """Run one AvailableNow drain and fold its progress telemetry."""
    q = (
        result_df
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.perf_counter()
    q.awaitTermination()
    wall = time.perf_counter() - t0
    rows = 0
    batch_ms = []
    state_rows_max = 0
    state_bytes_max = 0
    for p in q.recentProgress:
        if not isinstance(p, dict):  # PySpark 4 returns progress objects
            p = json.loads(p.json)
        rows += p.get("numInputRows", 0) or 0
        dur = (p.get("durationMs") or {}).get("triggerExecution")
        if dur:
            batch_ms.append(dur)
        for so in p.get("stateOperators") or []:
            state_rows_max = max(state_rows_max, so.get("numRowsTotal", 0) or 0)
            state_bytes_max = max(
                state_bytes_max, so.get("stateMemory", so.get("memoryUsedBytes", 0)) or 0
            )
    return {
        "input_rows": rows,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(rows / wall) if wall else None,
        "micro_batches": len(batch_ms),
        "batch_ms_mean": round(sum(batch_ms) / len(batch_ms)) if batch_ms else None,
        "batch_ms_max": max(batch_ms) if batch_ms else None,
        "state_rows_max": state_rows_max,
        "state_bytes_max": state_bytes_max,
    }


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from pyspark.sql import functions as F

    from financial_data_pipeline_spark import get_spark
    from financial_data_pipeline_spark.streaming.continuous_aggregate import (
        OHLCV_EVENT_SCHEMA,
        continuous_ohlcv,
    )
    from financial_data_pipeline_spark.streaming.cusum_stream import streaming_cusum
    from financial_data_pipeline_spark.streaming.dedup_stream import dedup_stream

    spark = get_spark(app_name="fdp-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="fdp_streambench_")
    print(f"building {k}x inputs ({n_files} files each) -> {root}", file=sys.stderr)
    dirs = build_inputs(spark, k, n_files, root)

    # frozen reference stats for cusum: batch mean/std per symbol
    bars_batch = spark.read.parquet(dirs["bars"])
    ref_stats = {
        r["symbol"]: (r["mu"], r["sd"])
        for r in bars_batch.groupBy("symbol")
        .agg(F.avg("close").alias("mu"), F.stddev_pop("close").alias("sd"))
        .collect()
    }

    def bar_stream():
        return (
            spark.readStream.format("parquet")
            .schema(OHLCV_EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .load(dirs["bars"])
        )

    import pyspark.sql.types as T

    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("event_time", T.TimestampType()),
        ]
    )

    def doc_stream():
        return (
            spark.readStream.format("parquet")
            .schema(doc_schema)
            .option("maxFilesPerTrigger", 1)
            .load(dirs["docs"])
        )

    # each drain gets a fresh checkpoint (fresh source offsets + state)
    res = {}
    res["continuous_ohlcv"] = drain(
        continuous_ohlcv(bar_stream(), "1 hour", "3 hours"),
        os.path.join(root, "ck_agg"),
    )
    print("continuous_ohlcv:", res["continuous_ohlcv"], file=sys.stderr)
    res["dedup_stream"] = drain(
        dedup_stream(doc_stream(), ts_col="event_time", watermark="1 hour"),
        os.path.join(root, "ck_dedup"),
    )
    print("dedup_stream:", res["dedup_stream"], file=sys.stderr)
    res["streaming_cusum"] = drain(
        streaming_cusum(bar_stream(), ref_stats, threshold=5.0),
        os.path.join(root, "ck_cusum"),
    )
    print("streaming_cusum:", res["streaming_cusum"], file=sys.stderr)

    n_syms = len(ref_stats)
    lines = [
        f"## {k}× point (`tools/stream_bench.py {k} {n_files}`)",
        "",
        f"sf0.1 amplified {k}× "
        f"({k * 100_000} pseudo-bars over {n_syms} symbols / 30 days, "
        f"{k * 5_000} docs with ~20% planted duplicates), written "
        f"time-ordered into {n_files} parquet files and drained as "
        f"{n_files} micro-batches (`maxFilesPerTrigger=1`, "
        "`Trigger.AvailableNow`, noop sink, fresh checkpoint). Numbers "
        "are the engine's own `StreamingQueryProgress` telemetry on "
        "local[32].",
        "",
        "| query | input rows | wall s | rows/s | batches | batch ms "
        "mean/max | peak state rows |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, r in res.items():
        lines.append(
            f"| {name} | {r['input_rows']} | {r['wall_sec']} |"
            f" {r['rows_per_sec']} | {r['micro_batches']} |"
            f" {r['batch_ms_mean']}/{r['batch_ms_max']} |"
            f" {r['state_rows_max']} |"
        )
    lines += [
        "",
        "## Reading the table",
        "",
        "- **continuous_ohlcv** state peaks at (symbols × open 1h "
        "buckets within the 3h watermark) — bounded by key-count × "
        "watermark/timeframe, NOT by stream length; time-ordered input "
        "lets the watermark evict as it drains. At 1000 executors the "
        "same state shards by (symbol, window) like any keyed agg.",
        "- **dedup_stream** state is one row per distinct content hash "
        "inside the watermark horizon (planted duplicates collapse "
        "~20% of input into 100 hashes). The eviction contract is the "
        "scale story: state is O(distinct docs / horizon), unbounded "
        "history belongs to `dedup_against_history`'s lake anti-join.",
        "- **streaming_cusum** is the `applyInPandasWithState` path — "
        "Arrow-batched Python, 4 doubles of state per symbol. Its "
        "rows/s is the Python-stateful floor; the JVM-side queries "
        "above it are the built-in ceiling. Per-batch latency stays "
        "flat across the drain (state never grows past key-count).",
        "",
        "Re-run after any streaming change; numbers are min-of-1 "
        "(AvailableNow drains are deterministic end-to-end, JVM warmup "
        "rides in the first micro-batch).",
    ]
    # APPEND a scale-point section — round 9 found the "w" mode here
    # silently destroyed every historical octave section on each run
    with open("STREAMBENCH.md", "a") as fh:
        fh.write("\n" + "\n".join(lines) + "\n")
    print(json.dumps({"k": k, "n_files": n_files, "results": res}))
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
