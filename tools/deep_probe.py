"""64× deep scale point (verdict-r5 item 8).

SCALING.md argues linearity at 8× for most queries and 32× for the
blocked family; this tool pushes one more doubling past that — the
TOP-5 heaviest bench queries plus the adaptive-planes blocked family
at 64× (6.4M events / 320k docs / 1M vectors) — and, unlike the base
probe, captures the Spark executor metrics a 100 TB memory-headroom
claim needs: per-run shuffle SPILL (memory+disk bytes) and max
per-stage ``peakExecutionMemory``, read from the status REST API
(``/api/v1/applications/<id>/stages``) with the UI enabled for this
session only.

A query is "linear with headroom" when (a) runtime ratio ≤ ~k, and
(b) spill stays 0 and peak execution memory per stage stays far below
executor memory as k doubles — growing per-partition memory at fixed
partition counts is exactly the failure AQE + sized
``spark.sql.files.maxPartitionBytes`` prevent at cluster scale.

Usage::

    python tools/deep_probe.py [k] [queries_csv]

Appends a ``## Round-6 deep point`` section to SCALING.md and prints
one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"

# the 5 most expensive bench queries per BENCH_DETAIL.json (r5)
TOP5 = [
    "curation_report",
    "kmeans_doc_clusters",
    "lsh_pair_recall",
    "minhash_lsh_pairs",
    "bpe_merges",
]


def _ui_base(spark) -> str:
    url = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    return f"{url}/api/v1/applications/{app_id}"


def _stage_metrics(spark) -> dict[int, dict]:
    """stageId → {spill_bytes, disk_spill_bytes, peak_exec_mem} for all
    completed stages so far (status REST API)."""
    with urllib.request.urlopen(f"{_ui_base(spark)}/stages?status=complete") as r:
        stages = json.load(r)
    out = {}
    for s in stages:
        out[(s["stageId"], s["attemptId"])] = {
            "mem_spill": s.get("memoryBytesSpilled", 0),
            "disk_spill": s.get("diskBytesSpilled", 0),
            "peak_mem": s.get("peakExecutionMemory", 0),
        }
    return out


def timed_run(spark, build_df, runs: int = 1) -> dict:
    """Best-of-runs wall time + the metric DELTA of the best run's new
    stages (spill summed, peak-exec-mem maxed)."""
    best = None
    for _ in range(runs):
        before = _stage_metrics(spark)
        t0 = time.perf_counter()
        build_df().write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        after = _stage_metrics(spark)
        new = [v for k, v in after.items() if k not in before]
        rec = {
            "sec": round(wall, 3),
            "mem_spill": sum(v["mem_spill"] for v in new),
            "disk_spill": sum(v["disk_spill"] for v in new),
            "peak_stage_mem": max((v["peak_mem"] for v in new), default=0),
            "stages": len(new),
        }
        if best is None or rec["sec"] < best["sec"]:
            best = rec
    return best


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    # an explicit query list narrows the probe to exactly those queries
    # (the blocked family is added only on the default full run)
    explicit = len(sys.argv) > 2 and sys.argv[2] not in ("", "-")
    names = sys.argv[2].split(",") if explicit else TOP5
    shuffle_parts = int(sys.argv[3]) if len(sys.argv) > 3 else None

    from financial_data_pipeline_spark import get_spark
    from financial_data_pipeline_spark.plans.driver_queries import QUERIES
    from tools.scaling_probe import _adaptive_blocked_probes, amplify

    extra_conf = {"spark.ui.enabled": "true"}
    spark = get_spark(
        app_name="fdp-deep-probe",
        extra_conf=extra_conf,
        **(
            {"shuffle_partitions": shuffle_parts}
            if shuffle_parts is not None
            else {}
        ),
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="fdp_deep_")
    print(f"amplifying {BASE} x{k} -> {tmp}", file=sys.stderr)
    t0 = time.perf_counter()
    amplify(spark, k, tmp)
    print(f"amplified in {time.perf_counter() - t0:.0f}s", file=sys.stderr)

    rows = []
    for name in names:
        r1 = timed_run(spark, lambda: QUERIES[name](spark, BASE), runs=2)
        rk = timed_run(spark, lambda: QUERIES[name](spark, tmp), runs=1)
        rows.append((name, r1, rk))
        print(
            f"{name}: {r1['sec']}s -> {rk['sec']}s ({rk['sec'] / r1['sec']:.1f}x), "
            f"spill {rk['mem_spill'] + rk['disk_spill']}B, "
            f"peak stage mem {rk['peak_stage_mem']}B",
            file=sys.stderr,
        )

    adaptive, (p1, pk) = (
        _adaptive_blocked_probes(k) if not explicit else ([], (0, 0))
    )
    for name, build in adaptive:
        label = f"{name} [planes {p1}->{pk}]"
        r1 = timed_run(spark, lambda: build(spark, BASE, p1), runs=2)
        rk = timed_run(spark, lambda: build(spark, tmp, pk), runs=1)
        rows.append((label, r1, rk))
        print(
            f"{label}: {r1['sec']}s -> {rk['sec']}s "
            f"({rk['sec'] / r1['sec']:.1f}x), "
            f"spill {rk['mem_spill'] + rk['disk_spill']}B, "
            f"peak stage mem {rk['peak_stage_mem']}B",
            file=sys.stderr,
        )

    def mb(b: int) -> str:
        return f"{b / 1e6:.0f}MB" if b else "0"

    probed = (
        "the top-5 heaviest bench queries plus the adaptive-planes "
        "blocked family"
        if not explicit
        else ", ".join(names)
    )
    parts_note = (
        f", {shuffle_parts} shuffle partitions"
        if shuffle_parts is not None
        else ""
    )
    lines = [
        "",
        f"## Deep point ({k}×, spill & peak memory{parts_note})",
        "",
        f"`tools/deep_probe.py {k}`: {probed} at {k}× "
        f"({k // 10}× the full sf1 volume on one 32-thread JVM"
        f"{parts_note}), with "
        "executor metrics from the status REST API. `peak stage mem` "
        "is the max per-stage `peakExecutionMemory` across the run — "
        "the number that must stay under executor memory at any scale; "
        "`spill` sums memory+disk shuffle spill (0 = every partition "
        "fit in memory).",
        "",
        f"| query | 1× sec | {k}× sec | ratio (data ×{k}) | {k}× spill "
        f"| {k}× peak stage mem |",
        "|---|---|---|---|---|---|",
    ]
    for name, r1, rk in rows:
        lines.append(
            f"| {name} | {r1['sec']} | {rk['sec']} |"
            f" {round(rk['sec'] / r1['sec'], 1)} |"
            f" {mb(rk['mem_spill'] + rk['disk_spill'])} |"
            f" {mb(rk['peak_stage_mem'])} |"
        )
    sup = [(n, r1, rk) for n, r1, rk in rows if rk["sec"] / r1["sec"] > k * 1.3]
    lines += [
        "",
        (
            "No query exceeded the data factor ×1.3."
            if not sup
            else "Super-linear: " + ", ".join(n for n, _, _ in sup) + "."
        ),
    ]
    with open("SCALING.md", "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print(
        json.dumps(
            {
                "k": k,
                "results": [
                    {"query": n, "x1": r1, f"x{k}": rk} for n, r1, rk in rows
                ],
            }
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
