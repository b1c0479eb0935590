"""Archive lake maintenance: retention and small-file compaction.

The reference's serving store handles these inside TimescaleDB —
``add_retention_policy`` (drop raw chunks after 1 year,
``timescaledb_schema.sql:38-40``) and native compression policies
(``timeseries_db.py:183-196``). On the parquet lake the equivalents are
partition-directory deletes and file rewrites, implemented here against
the Hadoop FileSystem API so the same code runs on local disk, HDFS,
or s3a://.

Scale notes:
- Retention is a metadata-sized operation: it lists ``year=/month=``
  directories (O(partitions), never O(files)) and issues recursive
  deletes — no executor work at all.
- Compaction reads only the partitions it rewrites, sizes the output
  file count from the partition's byte size (``target_bytes`` ≈ one
  HDFS block / parquet row-group multiple), and swaps via rename.
  Directory rename is atomic on HDFS; on object stores it is
  copy+delete — for concurrent-reader safety there, front the lake
  with a table format with transactional commits (Iceberg/Delta).
  Compact cold partitions (past the ingest watermark) only.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class PartitionInfo:
    year: int
    month: int
    path: str
    bytes: int
    n_files: int


def _iter_remote(it):
    """Materialize a Hadoop RemoteIterator (py4j can't iterate it)."""
    while it.hasNext():
        yield it.next()


def _fs(spark: SparkSession, path_str: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path, jvm


def list_month_partitions(spark: SparkSession, root: str) -> list[PartitionInfo]:
    """Enumerate ``year=Y/month=M`` partition directories with their
    total byte size and parquet file count (recursive, so symbol
    subpartitions are included)."""
    fs, rootp, jvm = _fs(spark, root)
    out: list[PartitionInfo] = []
    if not fs.exists(rootp):
        return out
    for ydir in fs.listStatus(rootp):
        yname = ydir.getPath().getName()
        if not (ydir.isDirectory() and yname.startswith("year=")):
            continue
        for mdir in fs.listStatus(ydir.getPath()):
            mname = mdir.getPath().getName()
            if not (mdir.isDirectory() and mname.startswith("month=")):
                continue
            summary = fs.getContentSummary(mdir.getPath())
            n_files = sum(
                1
                for f in _iter_remote(fs.listFiles(mdir.getPath(), True))
                if f.getPath().getName().endswith(".parquet")
            )
            out.append(
                PartitionInfo(
                    year=int(yname.split("=", 1)[1]),
                    month=int(mname.split("=", 1)[1]),
                    path=str(mdir.getPath()),
                    bytes=summary.getLength(),
                    n_files=n_files,
                )
            )
    return sorted(out, key=lambda p: (p.year, p.month))


def apply_retention(
    spark: SparkSession,
    root: str,
    cutoff_year: int,
    cutoff_month: int,
) -> list[str]:
    """Drop archive partitions strictly older than (cutoff_year,
    cutoff_month); returns the deleted partition paths.

    The manifest table (``root/_manifest``) is rewritten to match, so
    manifest-driven readers never see dangling partitions. Month
    granularity mirrors the partition layout — the retention unit IS
    the partition, exactly like hypertable chunk drops (never row-level
    deletes, which would rewrite data).
    """
    fs, _, jvm = _fs(spark, root)
    deleted: list[str] = []
    empties: set[str] = set()
    for p in list_month_partitions(spark, root):
        if (p.year, p.month) < (cutoff_year, cutoff_month):
            fs.delete(jvm.org.apache.hadoop.fs.Path(p.path), True)
            deleted.append(p.path)
            empties.add(p.path.rsplit("/", 1)[0])
    # remove year= dirs left empty
    for ydir in empties:
        yp = jvm.org.apache.hadoop.fs.Path(ydir)
        if fs.exists(yp) and len(fs.listStatus(yp)) == 0:
            fs.delete(yp, True)

    manifest_path = f"{root}/_manifest"
    mp = jvm.org.apache.hadoop.fs.Path(manifest_path)
    if deleted and fs.exists(mp):
        manifest = spark.read.parquet(manifest_path)
        kept = manifest.filter(
            (manifest.year > cutoff_year)
            | (
                (manifest.year == cutoff_year)
                & (manifest.month >= cutoff_month)
            )
        ).collect()  # manifest is O(partitions) rows — driver-safe
        if kept:
            spark.createDataFrame(kept, manifest.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(manifest_path)
        else:
            fs.delete(mp, True)
    return deleted


def _leaf_partitions(spark: SparkSession, root: str) -> list[PartitionInfo]:
    """Leaf ``year=/month=/symbol=`` partition directories (the
    compaction unit — rewriting above the leaf would inline the
    ``symbol`` partition column into the data files)."""
    fs, _, jvm = _fs(spark, root)
    out: list[PartitionInfo] = []
    for month_part in list_month_partitions(spark, root):
        mp = jvm.org.apache.hadoop.fs.Path(month_part.path)
        for sdir in fs.listStatus(mp):
            if not (
                sdir.isDirectory()
                and sdir.getPath().getName().startswith("symbol=")
            ):
                continue
            summary = fs.getContentSummary(sdir.getPath())
            n_files = sum(
                1
                for f in _iter_remote(fs.listFiles(sdir.getPath(), True))
                if f.getPath().getName().endswith(".parquet")
            )
            out.append(
                PartitionInfo(
                    year=month_part.year,
                    month=month_part.month,
                    path=str(sdir.getPath()),
                    bytes=summary.getLength(),
                    n_files=n_files,
                )
            )
    return out


def _compact_leaf(
    spark: SparkSession, leaf: PartitionInfo, target_bytes: int
) -> tuple[int, int]:
    """Rewrite one leaf directory into ``ceil(bytes/target_bytes)``
    files; returns (files_before, files_after).

    Swap is write-to-``<dir>__compact_tmp`` then rename — readers of
    the old directory are unaffected until the rename. Partition
    columns stay directory-encoded: the rewrite reads only the data
    columns (no basePath), so the files keep the original schema.
    """
    fs, _, jvm = _fs(spark, leaf.path)
    n_out = max(1, math.ceil(leaf.bytes / target_bytes))
    if leaf.n_files <= n_out:
        return (leaf.n_files, leaf.n_files)
    tmp = leaf.path + "__compact_tmp"
    df: DataFrame = spark.read.parquet(leaf.path)
    df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
    src, dst = (
        jvm.org.apache.hadoop.fs.Path(tmp),
        jvm.org.apache.hadoop.fs.Path(leaf.path),
    )
    fs.delete(dst, True)
    fs.rename(src, dst)
    # drop the _SUCCESS marker so the leaf holds only parquet parts
    success = jvm.org.apache.hadoop.fs.Path(leaf.path + "/_SUCCESS")
    if fs.exists(success):
        fs.delete(success, False)
    after = sum(
        1
        for f in _iter_remote(fs.listFiles(dst, True))
        if f.getPath().getName().endswith(".parquet")
    )
    return (leaf.n_files, after)


def compact_archive(
    spark: SparkSession,
    root: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict[str, tuple[int, int]]:
    """Compact every leaf partition whose file count exceeds both
    ``min_files`` and its size-derived target; returns
    {partition_path: (before, after)}. Run over cold partitions only
    (past the ingest watermark) — the swap is not transactional on
    object stores (see module docstring)."""
    results: dict[str, tuple[int, int]] = {}
    for leaf in _leaf_partitions(spark, root):
        n_target = max(1, math.ceil(leaf.bytes / target_bytes))
        if leaf.n_files > max(min_files, n_target):
            results[leaf.path] = _compact_leaf(spark, leaf, target_bytes)
    return results


def missing_partitions(
    spark: SparkSession,
    root: str,
    start: str,
    end: str,
    symbols: list[str] | None = None,
) -> DataFrame:
    """Backfill planner: the (symbol, year, month) partitions the
    archive SHOULD hold for ``[start, end]`` but doesn't.

    Expected = month calendar (``sequence`` + ``explode`` — generated
    distributed, no driver loop) × symbol list (defaults to the symbols
    present in the manifest). Actual = the manifest table — O(partitions)
    rows, so the anti join is a broadcast no matter how big the archive
    data is. Feed the result to the provider backfill loop
    (``providers.download_history`` per row) or to ``refresh_aggregate``
    windows.
    """
    months = spark.range(1).select(
        F.explode(
            F.sequence(
                F.trunc(F.lit(start).cast("date"), "month"),
                F.trunc(F.lit(end).cast("date"), "month"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("m")
    ).select(F.year("m").alias("year"), F.month("m").alias("month"))

    manifest = spark.read.parquet(f"{root}/_manifest")
    syms = (
        spark.createDataFrame([(s,) for s in symbols], ["symbol"])
        if symbols
        else manifest.select("symbol").distinct()
    )
    expected = months.crossJoin(syms)
    actual = manifest.select("year", "month", "symbol").distinct()
    return expected.join(
        actual, ["year", "month", "symbol"], "left_anti"
    ).orderBy("symbol", "year", "month")
