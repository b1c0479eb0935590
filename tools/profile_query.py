"""Per-query profiler for the optimization rounds.

For each named query (or --top N from BENCH_DETAIL.json):

- times min-of-3 noop-sink executions (bench methodology),
- counts Spark jobs/stages/tasks the query triggers (statusTracker
  delta), separating plan-construction time (Python + analysis; any
  eager jobs run by the query *builder*) from execution time,
- optionally writes ``.explain("formatted")`` to plans/r09/<q>_<tag>.txt.

Usage::

    python tools/profile_query.py [--explain-tag before] [--sf DIR] q1 q2 ...
    python tools/profile_query.py --top 25
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--explain-tag", default=None)
    ap.add_argument("--plans-dir", default="plans/r10")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from financial_data_pipeline_spark import get_spark
    from financial_data_pipeline_spark.plans.driver_queries import QUERIES

    names = list(args.queries)
    if args.top:
        with open(os.path.join(os.path.dirname(__file__), "..", "BENCH_DETAIL.json")) as fh:
            detail = json.load(fh)["queries"]
        names += [k for k, _ in sorted(detail.items(), key=lambda kv: -kv[1])[: args.top]]

    spark = get_spark(app_name="fdp-profile")
    spark.sparkContext.setLogLevel("ERROR")
    st = spark.sparkContext.statusTracker()

    # warmup
    QUERIES["symbol_stats"](spark, args.sf).write.format("noop").mode("overwrite").save()

    results = {}
    for name in names:
        fn = QUERIES[name]
        best = None
        for i in range(args.runs):
            jobs0 = st.getJobIdsForGroup(None)
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            jobs1 = st.getJobIdsForGroup(None)
            build_jobs = 0  # jobs triggered during plan construction
            rec = {
                "build_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "n_jobs": len(set(jobs1) - set(jobs0)),
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
        # count build-phase jobs once more precisely
        jobs0 = st.getJobIdsForGroup(None)
        df = fn(spark, args.sf)
        jobs_mid = st.getJobIdsForGroup(None)
        best["build_jobs"] = len(set(jobs_mid) - set(jobs0))
        results[name] = best
        print(
            f"{name:40s} total={best['total_s']:7.3f} build={best['build_s']:6.3f}"
            f" (jobs {best['build_jobs']}) exec={best['exec_s']:7.3f}"
            f" jobs={best['n_jobs']}"
        )
        if args.explain_tag:
            os.makedirs(args.plans_dir, exist_ok=True)
            with open(f"{args.plans_dir}/{name}_{args.explain_tag}.txt", "w") as fh:
                fh.write(
                    df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                            "formatted"
                        )
                    )
                )
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(results, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
