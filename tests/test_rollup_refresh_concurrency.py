"""Rollup refresh concurrency: the read-CDF → recompute → one-commit
window of ``refresh_rollup`` racing (a) a concurrent source writer and
(b) a concurrent second refresher, across REAL process boundaries
(three JVMs, one lake root).

What must hold (the watermark-atomicity contract):

- **No double-apply**: the watermark rides the same manifest write as
  the refreshed data, so a refresh that loses the target OCC race never
  half-lands — its buckets and its watermark vanish together and the
  retry recomputes from scratch per bucket (recompute-from-head is
  idempotent by construction).
- **No skip**: a source commit landing inside the refresh window is
  either seen by that refresh's recompute (read() resolves a newer
  head than the recorded watermark — the affected buckets are then
  re-flagged by the NEXT refresh's change feed and recomputed again)
  or processed by the next interval. Either way the final rollup
  equals a from-scratch recompute of the final source state.

The single-process lifecycle equivalence lives in
test_rollup_refresh.py; this test is only about the race."""

from __future__ import annotations

import os
import subprocess
import sys

_COMMON = '''
from pyspark.sql import functions as F


def key_of(df):
    return df.withColumn("day", (F.col("id") % 5).cast("int"))


def agg(df):
    return df.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")
    )
'''

_SRC_WRITER = _COMMON + '''
import sys
import time

from financial_data_pipeline_spark import get_spark
from financial_data_pipeline_spark.sources.laketable import (
    CommitConflict,
    LakeTable,
)

root, n = sys.argv[1], int(sys.argv[2])
spark = get_spark(app_name="rollup-src-writer", master="local[4]",
                  shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
src = LakeTable(spark, root + "/src", stat_cols=["id"])
for i in range(n):
    df = spark.range(i * 100, i * 100 + 100).selectExpr("id", "id * 2 AS v")
    for _attempt in range(200):
        try:
            src.commit(df)
            break
        except CommitConflict:
            continue
    else:
        sys.exit(2)
    time.sleep(0.3)  # leave room for refreshes to interleave mid-stream
print("WRITER DONE")
'''

_REFRESHER = _COMMON + '''
import sys
import time

from financial_data_pipeline_spark import get_spark
from financial_data_pipeline_spark.sources.laketable import (
    CommitConflict,
    LakeTable,
)
from financial_data_pipeline_spark.sources.rollup import (
    WATERMARK_KEY,
    refresh_rollup,
)

root, rid, n_src = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark(app_name=f"rollup-refresher-{rid}", master="local[4]",
                  shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
src = LakeTable(spark, root + "/src", stat_cols=["id"])
tgt = LakeTable(spark, root + "/agg", stat_cols=["day"])
deadline = time.time() + 540
while time.time() < deadline:
    try:
        refresh_rollup(src, tgt, key_of, agg, ["day"])
    except CommitConflict:
        continue  # lost the target OCC race to the other refresher
    wm = int(tgt.app_meta().get(WATERMARK_KEY, 0))
    if wm >= n_src:
        print("REFRESHER", rid, "DONE at wm", wm)
        sys.exit(0)
    time.sleep(0.05)
sys.exit(3)  # never converged
'''


def test_refresh_races_source_writer_and_second_refresher(spark, tmp_path):
    n = 5
    root = str(tmp_path / "lake")
    os.makedirs(root, exist_ok=True)
    wsrc = tmp_path / "src_writer.py"
    wref = tmp_path / "refresher.py"
    wsrc.write_text(_SRC_WRITER)
    wref.write_text(_REFRESHER)

    import financial_data_pipeline_spark as pkg

    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(wsrc), root, str(n)],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            env=env,
        )
    ] + [
        subprocess.Popen(
            [sys.executable, str(wref), root, rid, str(n)],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            env=env,
        )
        for rid in ("a", "b")
    ]
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out

    from pyspark.sql import functions as F

    from financial_data_pipeline_spark.sources.laketable import LakeTable
    from financial_data_pipeline_spark.sources.rollup import (
        WATERMARK_KEY,
        refresh_rollup,
    )

    src = LakeTable(spark, root + "/src", stat_cols=["id"])
    tgt = LakeTable(spark, root + "/agg", stat_cols=["day"])
    assert src.head_version() == n

    def key_of(df):
        return df.withColumn("day", (F.col("id") % 5).cast("int"))

    def agg(df):
        return df.groupBy("day").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")
        )

    # both refreshers exited at wm >= n; a final refresh must be a
    # pure no-op (same head) — nothing pending, nothing re-applied
    head = tgt.head_version()
    assert refresh_rollup(src, tgt, key_of, agg, ["day"]) == head
    assert int(tgt.app_meta()[WATERMARK_KEY]) == n

    # the rollup equals a from-scratch recompute of the final source:
    # no interval skipped, no interval double-applied, despite source
    # commits landing inside refresh windows and two refreshers racing
    want = {
        (r["day"], r["n"], r["total"])
        for r in agg(key_of(src.read())).collect()
    }
    got = {(r["day"], r["n"], r["total"]) for r in tgt.read().collect()}
    assert got == want
    # every target snapshot on the committed line is a real refresh
    # (none aborted/staged) and watermarks are monotone along it
    wms = []
    for v in range(1, tgt.head_version() + 1):
        s = tgt._load_snapshot(v)
        if s.aborted or s.staged or v in tgt._detached():
            continue
        wms.append(int(s.app_meta.get(WATERMARK_KEY, 0)))
    assert wms == sorted(wms)
