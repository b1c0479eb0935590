"""Configuration management (SURVEY.md §2.12 E1 front door).

Mirrors ``src/data_etl/pipelines/config_manager.py:17-89``: a dict
config built as defaults → environment → JSON file (deep merge, file
wins), with dot-notation get/set, validation, and save. The engine adds
one seam the reference lacks: :func:`pipeline_config_from_dict` maps the
reference's ``config/pipeline_config.json:1-30`` shape onto the typed
:class:`~financial_data_pipeline_spark.plans.pipeline.PipelineConfig`
dataclass that drives ``run_pipeline`` — so a user can point the engine
at their existing JSON config unchanged.
"""

from __future__ import annotations

import json
import os
from typing import Any

from financial_data_pipeline_spark.plans.pipeline import PipelineConfig


def default_config() -> dict[str, Any]:
    """Defaults + environment, exactly the reference's merge base
    (``config_manager.py:30-64``; env is read at call time, so env
    overrides defaults and the JSON file overrides both)."""
    return {
        "data_dir": "data/processed",
        "db_config": {
            "host": os.getenv("DB_HOST", "localhost"),
            "port": int(os.getenv("DB_PORT", 5432)),
            "database": os.getenv("DB_NAME", "exodus_data"),
            "user": os.getenv("DB_USER", "postgres"),
            "password": os.getenv("DB_PASSWORD", "your_password"),
        },
        "providers": {
            "bybit": {
                "api_key": os.getenv("BYBIT_API_KEY", "your_api_key"),
                "api_secret": os.getenv("BYBIT_API_SECRET", "your_api_secret"),
                "testnet": os.getenv("BYBIT_TESTNET", "true").lower() == "true",
            }
        },
        "validation_config": {
            "handle_missing": "interpolate",
            "outlier_method": "iqr",
            "outlier_threshold": 1.5,
            "min_records": 100,
            "max_gap_hours": 24,
        },
        "split_config": {
            "train_test_split": {"test_size": 0.2, "method": "chronological"}
        },
        "storage_config": {
            "save_files": True,
            "store_db": True,
            "file_format": "parquet",
            "compression": "snappy",
        },
    }


def deep_merge(base: dict[str, Any], update: dict[str, Any]) -> dict[str, Any]:
    """Recursive dict merge, update wins (``config_manager.py:75-89``)."""
    for key, value in update.items():
        if key in base and isinstance(base[key], dict) and isinstance(value, dict):
            deep_merge(base[key], value)
        else:
            base[key] = value
    return base


class ConfigManager:
    """Dict-config front door (``config_manager.py:12-149``): defaults
    (env-aware) deep-merged with an optional JSON file, dot-notation
    access, validation, round-trip save."""

    def __init__(self, config_file: str | None = None):
        self.config_file = config_file
        self.config = default_config()
        if config_file and os.path.exists(config_file):
            with open(config_file) as f:
                deep_merge(self.config, json.load(f))

    def get(self, key: str | None = None) -> Any:
        """Dot-notation lookup; None key returns the whole dict
        (``config_manager.py:91-113``)."""
        if key is None:
            return self.config
        value: Any = self.config
        for k in key.split("."):
            if isinstance(value, dict) and k in value:
                value = value[k]
            else:
                return None
        return value

    def set(self, key: str, value: Any) -> None:
        """Dot-notation set, creating intermediate dicts
        (``config_manager.py:115-131``)."""
        keys = key.split(".")
        cfg = self.config
        for k in keys[:-1]:
            cfg = cfg.setdefault(k, {})
        cfg[keys[-1]] = value

    def save(self, config_file: str | None = None) -> None:
        path = config_file or self.config_file
        if path is None:
            raise ValueError("No configuration file specified")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.config, f, indent=2, default=str)

    def validate_config(self) -> dict[str, Any]:
        """Shape checks (``config_manager.py:183-233``) — the engine
        has no live DB/provider in this container, so checks are
        structural only."""
        issues: dict[str, Any] = {"errors": [], "warnings": [], "is_valid": True}
        db = self.get("db_config")
        if not db:
            issues["errors"].append("Database configuration missing")
            issues["is_valid"] = False
        else:
            for field in ["host", "port", "database", "user", "password"]:
                if not db.get(field):
                    issues["errors"].append(f"Database field '{field}' missing")
                    issues["is_valid"] = False
        if not self.get("providers"):
            issues["warnings"].append("No data providers configured")
        return issues


def pipeline_config_from_dict(cfg: dict[str, Any]) -> PipelineConfig:
    """Map the reference JSON shape (``config/pipeline_config.json``)
    onto the engine's typed run knobs.

    Recognized paths: ``pipeline_config.assets[*].symbol`` → symbols,
    first asset's ``timeframe`` → interval,
    ``pipeline_config.splits.train_test_split.{test_size,method}`` →
    split knobs, ``validation_config.outlier_threshold`` → IQR factor
    (reported via the validation report), ``data_dir`` +
    ``storage_config.{save_files,file_format}`` → sink knobs.
    """
    pc = cfg.get("pipeline_config", {})
    assets = pc.get("assets") or [{"symbol": "BTCUSDT", "timeframe": "1h"}]
    tts = (pc.get("splits") or cfg.get("split_config") or {}).get(
        "train_test_split", {}
    )
    storage = cfg.get("storage_config", {})
    save_files = pc.get("save_files", storage.get("save_files", True))
    handle_missing = (cfg.get("validation_config") or {}).get(
        "handle_missing", "interpolate"
    )
    return PipelineConfig(
        symbols=[a["symbol"] for a in assets],
        interval=assets[0].get("timeframe", "1h"),
        impute_method=(
            "interpolate" if handle_missing == "interpolate" else "ffill"
        ),
        test_size=float(tts.get("test_size", 0.2)),
        split_method=tts.get("method", "chronological"),
        output_dir=cfg.get("data_dir") if save_files else None,
        output_formats=[storage.get("file_format", "parquet")],
    )


def pipeline_config_from_file(
    config_file: str | None = None, **overrides: Any
) -> PipelineConfig:
    """defaults → env → JSON file → explicit overrides, returning the
    typed run config (the reference's init order,
    ``config_manager.py:17-28``, plus the engine's typed layer)."""
    mgr = ConfigManager(config_file)
    pc = pipeline_config_from_dict(mgr.config)
    return pc.with_overrides(**overrides) if overrides else pc
