"""Sources (SURVEY.md §2.1 S5, S8, S11, S15).

Thin, schema-enforcing readers. The reference's manual month-directory
walk for archive retrieval (``data_storage_manager.py:147-254``) is
replaced by Hive-partitioned parquet + Catalyst partition pruning: a
filter on year/month/symbol prunes directories, a filter on timestamp
prunes row groups via parquet min/max stats — no custom code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S8: parquet scan (filters/projection push down automatically)."""
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (columnar pushdown/pruning like parquet)."""
    return spark.read.orc(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    corrupt_col: str | None = None,
) -> DataFrame:
    """S5: CSV with declared schema (or header inference for fixtures).

    ``corrupt_col``: quarantine column for malformed rows (PERMISSIVE
    mode). A 100 TB ingest must not die on one bad line (the
    reference's posture too — ``pd.to_numeric(errors="coerce")``,
    ``data_cleaner.py:117-118``): unparseable fields null out, the raw
    line lands in ``corrupt_col``, and the caller splits clean rows
    from the quarantine with one filter instead of a re-read.
    """
    reader = spark.read.option("header", True)
    if schema is not None:
        if corrupt_col is not None:
            schema = T.StructType(
                [*schema.fields, T.StructField(corrupt_col, T.StringType())]
            )
            reader = (
                reader.option("mode", "PERMISSIVE")
                .option("columnNameOfCorruptRecord", corrupt_col)
            )
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_archive(
    spark: SparkSession,
    root: str,
    symbol: str | None = None,
    start: str | None = None,
    end: str | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """S11: archive retrieval with partition pruning.

    The reference enumerates ``archives/{year}/{month:02d}/{symbol}/``
    directories in the requested range by hand
    (``data_storage_manager.py:175-199``); here the same layout is a
    partitioned parquet dataset and Catalyst prunes partitions from the
    year/month/symbol predicates derived from the timestamp range.

    ``merge_schema=True`` unions the footers of every file so columns
    added later in the archive's life appear (null-filled for old
    files) — schema evolution without rewriting history. Off by
    default: footer-merging lists every file's metadata, which costs
    real time on a large lake, and the common read path trusts the
    latest schema.
    """
    df = spark.read.option("mergeSchema", merge_schema).parquet(root)
    if symbol is not None:
        df = df.filter(F.col("symbol") == symbol)
    if start is not None:
        s = F.lit(start).cast("timestamp")
        df = df.filter(
            (F.col("timestamp") >= s)
            & (
                (F.col("year") > F.year(s))
                | ((F.col("year") == F.year(s)) & (F.col("month") >= F.month(s)))
            )
        )
    if end is not None:
        e = F.lit(end).cast("timestamp")
        df = df.filter(
            (F.col("timestamp") <= e)
            & (
                (F.col("year") < F.year(e))
                | ((F.col("year") == F.year(e)) & (F.col("month") <= F.month(e)))
            )
        )
    return df


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    predicates: list[str] | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """S15: JDBC scan; WHERE/LIMIT filters push down to the database."""
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    df = reader.load()
    for p in predicates or []:
        df = df.filter(p)
    return df


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    corrupt_col: str | None = None,
) -> DataFrame:
    """JSON-lines corpus reader — the wire format LLM corpora actually
    ship in (one JSON doc per line). Same quarantine posture as
    ``read_csv``: with ``corrupt_col`` set, malformed lines land intact
    in the quarantine column instead of killing the ingest (PERMISSIVE),
    and one filter splits clean rows from the quarantine. A declared
    schema skips Spark's inference pass (one full extra scan at 100 TB)
    and pins types against drifting producers.

    Spark quirk (documented upstream): a query that reads ONLY the
    corrupt column from the raw scan is disallowed
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache/persist the parsed
    frame before auditing the quarantine on its own."""
    reader = spark.read
    if schema is not None:
        if corrupt_col is not None:
            schema = T.StructType(
                [*schema.fields, T.StructField(corrupt_col, T.StringType())]
            )
            reader = reader.option("mode", "PERMISSIVE").option(
                "columnNameOfCorruptRecord", corrupt_col
            )
        reader = reader.schema(schema)
    return reader.json(path)
