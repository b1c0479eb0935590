"""File backup / restore / retention utility (SURVEY.md §2.1 S20).

Driver-side filesystem tooling, not a dataflow operator — mirrors
``raw/data_backup.py:56-247`` and ``data_storage_manager.py:256-465``:
timestamped copies with sha256 verification, gzip option, restore, and
retention cleanup honoring both ``keep_days`` and ``minimum_keep``. At
100 TB the real backup story is lake-level (object-store versioning /
snapshot tables); this covers the reference's local-file semantics.
"""

from __future__ import annotations

import gzip
import json
import os
import shutil
from datetime import datetime, timezone
from pathlib import Path

from financial_data_pipeline_spark.metadata import sha256_file


class BackupManager:
    def __init__(self, backup_dir: str, clock=None) -> None:
        self.backup_dir = Path(backup_dir)
        self.backup_dir.mkdir(parents=True, exist_ok=True)
        self._meta_path = self.backup_dir / "backups.json"
        self._clock = clock or (lambda: datetime.now(timezone.utc))
        self.metadata: dict = {}
        if self._meta_path.exists():
            self.metadata = json.loads(self._meta_path.read_text())

    def _save_meta(self) -> None:
        self._meta_path.write_text(json.dumps(self.metadata, indent=2))

    def create_backup(
        self, source_path: str, description: str | None = None, compress: bool = False
    ) -> dict:
        """Timestamped copy + sha256 (``data_backup.py:56-102``)."""
        src = Path(source_path)
        if not src.exists():
            raise FileNotFoundError(f"Source path does not exist: {src}")
        ts = self._clock().strftime("%Y%m%d_%H%M%S_%f")
        dest = self.backup_dir / ts
        if src.is_file():
            if compress:
                dest = dest.with_suffix(".gz")
                with open(src, "rb") as fin, gzip.open(dest, "wb") as fout:
                    shutil.copyfileobj(fin, fout)
            else:
                shutil.copy2(src, dest)
            checksum = sha256_file(str(src))
            is_dir = False
        else:
            shutil.copytree(src, dest)
            checksum = None
            is_dir = True
        meta = {
            "timestamp": ts,
            "source_path": str(src),
            "backup_path": str(dest),
            "description": description,
            "is_directory": is_dir,
            "compressed": compress and not is_dir,
            "checksum": checksum,
        }
        self.metadata[ts] = meta
        self._save_meta()
        return meta

    def verify_backup(self, timestamp: str) -> bool:
        """sha256 re-check of a (non-compressed) file backup."""
        info = self.metadata[timestamp]
        if info["is_directory"] or info["compressed"]:
            return Path(info["backup_path"]).exists()
        return sha256_file(info["backup_path"]) == info["checksum"]

    def restore_backup(self, timestamp: str, restore_path: str | None = None) -> str:
        """Copy a backup back over (or next to) the original
        (``data_backup.py:104-150``); verifies checksum on the way."""
        if timestamp not in self.metadata:
            raise ValueError(f"No backup found for timestamp: {timestamp}")
        info = self.metadata[timestamp]
        target = Path(restore_path or info["source_path"])
        src = Path(info["backup_path"])
        if info["is_directory"]:
            if target.exists():
                shutil.rmtree(target)
            shutil.copytree(src, target)
        elif info["compressed"]:
            with gzip.open(src, "rb") as fin, open(target, "wb") as fout:
                shutil.copyfileobj(fin, fout)
        else:
            shutil.copy2(src, target)
        if not info["is_directory"] and info["checksum"]:
            if sha256_file(str(target)) != info["checksum"]:
                raise IOError(f"checksum mismatch restoring {timestamp}")
        return str(target)

    def list_backups(self) -> list[dict]:
        """Newest first (``data_backup.py:170-180``)."""
        return sorted(
            self.metadata.values(), key=lambda m: m["timestamp"], reverse=True
        )

    def cleanup(self, keep_days: int = 30, minimum_keep: int = 5) -> list[str]:
        """Retention (``data_storage_manager.py:418-465``): always keep
        the newest ``minimum_keep``; delete older-than-``keep_days``
        beyond that. Returns deleted timestamps."""
        now = self._clock()
        deleted = []
        for info in self.list_backups()[minimum_keep:]:
            made = datetime.strptime(
                info["timestamp"], "%Y%m%d_%H%M%S_%f"
            ).replace(tzinfo=timezone.utc)
            if (now - made).days > keep_days:
                p = Path(info["backup_path"])
                if p.is_dir():
                    shutil.rmtree(p, ignore_errors=True)
                elif p.exists():
                    os.remove(p)
                deleted.append(info["timestamp"])
                del self.metadata[info["timestamp"]]
        if deleted:
            self._save_meta()
        return deleted
