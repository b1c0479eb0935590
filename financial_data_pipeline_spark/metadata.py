"""Dataset metadata / lineage / quality layer (SURVEY.md §1.3, S17/S18).

The reference keeps dataset metadata twice: JSON files + an
``index.json`` lookup (``enhanced_metadata_manager.py:85-299``) and four
Postgres tables with JSONB payloads (``metadata_db.py:54-122``). Here:

- ``DatasetMetadata`` mirrors the reference dataclass
  (``enhanced_metadata_manager.py:40-65``).
- ``compute_metadata`` derives the data-dependent fields (record count,
  date range, missing %, quality score) in ONE Spark aggregate pass —
  the reference walks the frame repeatedly.
- ``MetadataStore`` is the JSON-file store + index (S18). Metadata is
  driver-scale (one row per dataset), so files are fine; the relational
  twin is ``metadata_table`` — a small DataFrame you can join (J1) or
  append to any sink.
- Lineage rows link datasets; ``lineage_join`` (J1,
  ``metadata_db.py:437-460``) lives in plans/driver_queries as an
  oracle-checked query; the broadcast-join helper here is the reusable
  form.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict, dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCRIPT_VERSION = "spark-1.0"


@dataclass
class DatasetMetadata:
    """Mirror of ``enhanced_metadata_manager.py:40-65``."""

    symbol: str
    interval: str
    csv_file: str = ""
    num_records: int = 0
    data_hash: str = ""
    created_at: str = ""
    script_version: str = SCRIPT_VERSION
    data_source: str = ""
    start_date: str = ""
    end_date: str = ""
    file_size_bytes: int = 0
    columns: list[str] = field(default_factory=list)
    quality_score: float = 0.0
    missing_pct: float = 0.0
    extra_fields: dict = field(default_factory=dict)

    @property
    def key(self) -> str:
        return f"{self.symbol}_{self.interval}"


def sha256_file(path: str, chunk: int = 1 << 20) -> str:
    """F13: streaming file hash (``enhanced_metadata_manager.py:140-152``)."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def compute_metadata(
    df: DataFrame,
    symbol: str,
    interval: str,
    data_source: str = "",
    ts: str = "timestamp",
) -> DatasetMetadata:
    """One aggregate pass → metadata fields (A5 date range, A9 missing %,
    simple quality = 100 − missing% as ``enhanced_metadata_manager.py:
    154-172``)."""
    cols = df.columns
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.min(ts).cast("string").alias("start"),
        F.max(ts).cast("string").alias("end"),
    ] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}") for c in cols
    ]
    row = df.agg(*aggs).first()
    n = row["n"] or 0
    total_cells = n * len(cols)
    missing = sum(row[f"null_{c}"] or 0 for c in cols)
    missing_pct = (missing / total_cells * 100.0) if total_cells else 0.0
    return DatasetMetadata(
        symbol=symbol,
        interval=interval,
        num_records=n,
        created_at=datetime.now(timezone.utc).isoformat(),
        data_source=data_source,
        start_date=row["start"] or "",
        end_date=row["end"] or "",
        columns=list(cols),
        quality_score=round(100.0 - missing_pct, 2),
        missing_pct=round(missing_pct, 4),
    )


class MetadataStore:
    """S18: JSON-file metadata store with an index (driver-side)."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._index_path = os.path.join(root, "index.json")

    def _load_index(self) -> dict:
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                return json.load(f)
        return {}

    def save(self, md: DatasetMetadata) -> str:
        path = os.path.join(self.root, f"{md.key}.json")
        with open(path, "w") as f:
            json.dump(asdict(md), f, indent=2, default=str)
        index = self._load_index()
        index[md.key] = {
            "file": os.path.basename(path),
            "symbol": md.symbol,
            "interval": md.interval,
            "num_records": md.num_records,
            "created_at": md.created_at,
        }
        with open(self._index_path, "w") as f:
            json.dump(index, f, indent=2)
        return path

    def load(self, symbol: str, interval: str) -> DatasetMetadata | None:
        path = os.path.join(self.root, f"{symbol}_{interval}.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return DatasetMetadata(**json.load(f))

    def list_keys(self) -> list[str]:
        return sorted(self._load_index())

    def rebuild_index(self) -> dict:
        """Re-derive index.json from the .json files on disk
        (``enhanced_metadata_manager.py:251-269``)."""
        index = {}
        for name in sorted(os.listdir(self.root)):
            if not name.endswith(".json") or name == "index.json":
                continue
            with open(os.path.join(self.root, name)) as f:
                d = json.load(f)
            md = DatasetMetadata(**d)
            index[md.key] = {
                "file": name,
                "symbol": md.symbol,
                "interval": md.interval,
                "num_records": md.num_records,
                "created_at": md.created_at,
            }
        with open(self._index_path, "w") as f:
            json.dump(index, f, indent=2)
        return index


def metadata_table(
    spark: SparkSession, records: list[DatasetMetadata]
) -> DataFrame:
    """Relational twin of the JSON store (S17 ``dataset_metadata``):
    a small DataFrame; ``extra_fields`` as a JSON string (the JSONB
    analog), joinable/appendable to any sink."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("symbol", T.StringType()),
            T.StructField("interval", T.StringType()),
            T.StructField("csv_file", T.StringType()),
            T.StructField("num_records", T.LongType()),
            T.StructField("data_hash", T.StringType()),
            T.StructField("created_at", T.StringType()),
            T.StructField("script_version", T.StringType()),
            T.StructField("data_source", T.StringType()),
            T.StructField("start_date", T.StringType()),
            T.StructField("end_date", T.StringType()),
            T.StructField("file_size_bytes", T.LongType()),
            T.StructField("columns", T.ArrayType(T.StringType())),
            T.StructField("quality_score", T.DoubleType()),
            T.StructField("missing_pct", T.DoubleType()),
            T.StructField("extra_fields", T.StringType()),
        ]
    )
    rows = []
    for md in records:
        d = asdict(md)
        d["extra_fields"] = json.dumps(d["extra_fields"], sort_keys=True)
        d["columns"] = list(d["columns"])
        rows.append(tuple(d[f.name] for f in schema.fields))
    return spark.createDataFrame(rows, schema)


def pipeline_status(
    spark: SparkSession, data_dir: str, store: "MetadataStore | None" = None
) -> dict:
    """Overall pipeline status summary
    (``pipeline_status_report.py:176-216``): processed parquet files +
    record totals under ``data_dir``, manifest record totals from the
    metadata store, and coverage (manifest / files). One Spark job per
    distinct file set (the reference loops pandas ``read_parquet`` per
    file); corrupt/unreadable files are skipped, as there.
    """
    import glob as _glob

    paths = sorted(
        _glob.glob(os.path.join(data_dir, "**", "*.parquet"), recursive=True)
    )
    total_records = 0
    readable = []
    for p in paths:
        try:
            total_records += spark.read.parquet(p).count()
            readable.append(p)
        except Exception:  # noqa: BLE001 - mirror the reference's skip
            continue
    manifest_records = 0
    if store is not None:
        manifest_records = sum(
            int(v.get("num_records") or 0) for v in store._load_index().values()
        )
    out = {
        "total_files": len(readable),
        "total_records": total_records,
        "manifest_records": manifest_records,
    }
    if manifest_records > 0 and total_records > 0:
        out["coverage_pct"] = round(manifest_records / total_records * 100, 1)
    return out


def lineage_upstream(
    lineage: DataFrame, metadata: DataFrame, target_id
) -> DataFrame:
    """J1: lineage ↔ metadata join, upstream direction
    (``metadata_db.py:437-448``). Dimension side broadcast — it is
    one row per dataset, never large."""
    dm = F.broadcast(metadata.select(F.col("id"), F.col("dataset_name")))
    return (
        lineage.filter(F.col("target_dataset_id") == target_id)
        .join(dm, lineage["source_dataset_id"] == dm["id"], "inner")
        .drop(dm["id"])
    )
