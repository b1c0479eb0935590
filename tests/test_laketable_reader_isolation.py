"""Reader isolation under concurrent vacuum (Iceberg's reader
contract): a reader pinned to a TAGGED snapshot must keep producing
correct results while another process churns commit/compact/expire —
tag retention keeps its manifest AND data files alive. A reader pinned
to an UNTAGGED snapshot that a vacuum expires must either still return
the correct result or fail with a clean error — NEVER a silently
partial/wrong one (Spark's default ignoreMissingFiles=false turns a
deleted data file into a task failure, not missing rows).

Two OS processes, two JVMs, marker-file handshakes per round — the
writer only vacuums while the reader is parked between scans, and the
reader re-executes the full scan after every vacuum round.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

_TAGGED_READER = '''
import sys, time, os

from financial_data_pipeline_spark import get_spark
from financial_data_pipeline_spark.sources.laketable import LakeTable

root, workdir, expected, rounds = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
)
spark = get_spark(app_name="pin-reader", master="local[4]", shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
t = LakeTable(spark, root, stat_cols=["day"])
df = t.read(ref="pin")
for i in range(rounds):
    got = df.count(), df.agg({"value": "sum"}).collect()[0][0]
    if got[0] != expected:
        print("WRONG", got, flush=True)
        sys.exit(3)
    open(os.path.join(workdir, f"ready_{i}"), "w").close()
    deadline = time.time() + 120
    while not os.path.exists(os.path.join(workdir, f"go_{i}")):
        if time.time() > deadline:
            sys.exit(5)
        time.sleep(0.05)
# one final re-scan after the last vacuum round
if df.count() != expected:
    print("WRONG final", flush=True)
    sys.exit(3)
print("DONE", flush=True)
'''

_EXPIRED_READER = '''
import sys, time, os

from financial_data_pipeline_spark import get_spark
from financial_data_pipeline_spark.sources.laketable import LakeTable

root, workdir, version, expected = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
)
spark = get_spark(app_name="expired-reader", master="local[4]", shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
t = LakeTable(spark, root, stat_cols=["day"])
df = t.read(version=version)
if df.count() != expected:
    print("WRONG before vacuum", flush=True)
    sys.exit(3)
open(os.path.join(workdir, "ready_0"), "w").close()
deadline = time.time() + 120
while not os.path.exists(os.path.join(workdir, "go_0")):
    if time.time() > deadline:
        sys.exit(5)
    time.sleep(0.05)
# the pinned snapshot was expired between the two scans: the re-scan
# must be all-or-nothing — correct count (page-cache/still-live files)
# or a raised error; a partial count is silent corruption
try:
    got = df.count()
except Exception:
    print("CLEAN-ERROR", flush=True)
    sys.exit(4)
if got == expected:
    print("DONE", flush=True)
    sys.exit(0)
print("WRONG partial", got, flush=True)
sys.exit(3)
'''


def _spawn(script_body: str, tmp_path, args: list[str]):
    script = tmp_path / "reader.py"
    script.write_text(script_body)
    import financial_data_pipeline_spark as pkg

    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, str(script), *args],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        env=env,
    )


def _await_marker(path: str, timeout: float = 120.0) -> None:
    deadline = time.time() + timeout
    while not os.path.exists(path):
        assert time.time() < deadline, f"marker {path} never appeared"
        time.sleep(0.05)


def test_tagged_reader_survives_concurrent_vacuum(spark, tmp_path):
    from pyspark.sql import functions as F

    from financial_data_pipeline_spark.sources.laketable import (
        LakeTable,
        compact,
    )

    root = str(tmp_path / "lake")
    work = str(tmp_path / "sync")
    os.makedirs(work)
    t = LakeTable(spark, root, stat_cols=["day"])

    def batch(lo, hi, tag):
        return (
            spark.range(lo * 100, hi * 100)
            .select(
                (F.col("id") / 100).cast("int").alias("day"),
                F.col("id").alias("value"),
                F.lit(tag).alias("tag"),
            )
            .repartition(4)  # several small files → compact() qualifies
        )

    v1 = t.commit(batch(0, 2, "pinned"))
    t.tag("pin", v1)
    rounds = 3
    proc = _spawn(
        _TAGGED_READER, tmp_path, [root, work, "200", str(rounds)]
    )
    try:
        for i in range(rounds):
            _await_marker(os.path.join(work, f"ready_{i}"))
            # churn while the reader is parked: new commit, compaction
            # rewrite, then a vacuum that keeps only HEAD + tags
            t.commit(batch(2 + i, 3 + i, f"churn{i}"))
            compact(t, small_file_rows=100_000)
            t.expire_snapshots(keep_last=1)
            open(os.path.join(work, f"go_{i}"), "w").close()
        out, _ = proc.communicate(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out
    assert b"DONE" in out
    # the tag's data files are still on disk after all the vacuums
    for p in t.pruned_files(version=v1):
        assert os.path.exists(p)


def test_expired_untagged_reader_fails_clean_never_partial(spark, tmp_path):
    from pyspark.sql import functions as F

    from financial_data_pipeline_spark.sources.laketable import LakeTable

    root = str(tmp_path / "lake")
    work = str(tmp_path / "sync")
    os.makedirs(work)
    t = LakeTable(spark, root, stat_cols=["day"])

    def batch(lo, hi, tag):
        return (
            spark.range(lo * 100, hi * 100)
            .select(
                (F.col("id") / 100).cast("int").alias("day"),
                F.col("id").alias("value"),
                F.lit(tag).alias("tag"),
            )
            .repartition(4)
        )

    t.commit(batch(0, 2, "a"))                       # v1 (untagged)
    t.commit(batch(5, 6, "b"), mode="overwrite")     # v2 = HEAD

    proc = _spawn(_EXPIRED_READER, tmp_path, [root, work, "1", "200"])
    try:
        _await_marker(os.path.join(work, "ready_0"))
        deleted = t.expire_snapshots(keep_last=1)    # v1 + its files gone
        assert deleted, "vacuum should have reclaimed v1's data files"
        open(os.path.join(work, "go_0"), "w").close()
        out, _ = proc.communicate(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
    # all-or-nothing: 0 = full correct result, 4 = clean raised error;
    # 3 would mean a silently partial scan — the corruption this test bans
    assert proc.returncode in (0, 4), out
    assert b"WRONG" not in out
