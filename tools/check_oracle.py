"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry in ``__spark_entry__`` against its
``oracle_sql()`` twin via DuckDB at the given SF dir and compares
row count + (sorted) schema + order-insensitive values. Exits nonzero
on any mismatch. Usage::

    python tools/check_oracle.py [--json out.json] [sf_dir] [query ...]

``--json`` writes a driver-faithful artifact (one object per query:
rows_match / schema_match / hash_match / spark_rows / oracle_rows /
err — hash_match is null for rows-only queries) so a full sweep can be
committed per round (``CORRECTNESS_full_rNN.json``) and diffed instead
of re-run.
"""

from __future__ import annotations

import json
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype) == "boolean":
            # nulls stringify differently per bridge (None vs NaN vs
            # pd.NA) — canonicalize all of them to 'None' first
            df[c] = (
                df[c].astype(object).where(pd.notna(df[c]), None).astype(str)
            )
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _kind(dt) -> str:
    """Coarse dtype class — the driver hashes SERIALIZED values, so an
    int column vs a float column (1686 vs 1686.0) is a hash mismatch
    even when numerically equal. numpy coercion in the value check
    below can't see that; this can."""
    try:
        if np.issubdtype(dt, np.integer):
            return "int"
        if np.issubdtype(dt, np.floating):
            return "float"
    except TypeError:
        pass
    s = str(dt)
    if s.startswith(("Int", "UInt")):
        return "int"
    if s.startswith("Float"):
        return "float"
    return "other"


def compare(name: str, sp: pd.DataFrame, ora: pd.DataFrame) -> list[str]:
    # columns + dtype skew are checked BEFORE the rowcount so the
    # --json artifact's schema_match is honest even when rowcounts
    # differ (a rowcount early-return used to mask dtype regressions)
    if sorted(sp.columns) != sorted(ora.columns):
        return [f"columns {sorted(sp.columns)} vs {sorted(ora.columns)}"]
    errs = []
    for c in sorted(sp.columns):
        ka, kb = _kind(sp[c].dtype), _kind(ora[c].dtype)
        if {ka, kb} == {"int", "float"}:
            errs.append(
                f"col {c}: dtype skew {sp[c].dtype} vs {ora[c].dtype}"
                " (driver value-hash would mismatch)"
            )
    if len(sp) != len(ora):
        return errs + [f"rowcount {len(sp)} vs {len(ora)}"]
    if errs:
        return errs
    a, b = canon(sp), canon(ora)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(
            b[c].dtype, np.floating
        ):
            ok = np.allclose(
                av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True
            )
            if not ok:
                d = np.abs(av.astype(float) - bv.astype(float))
                errs.append(f"col {c}: maxdiff {np.nanmax(d)}")
        else:
            if not (av == bv).all():
                i = int(np.argmax(av != bv))
                errs.append(f"col {c}: first diff row {i}: {av[i]!r} vs {bv[i]!r}")
    return errs


def sweep(spark, sf_dir: str, only=None, json_out=None, quiet=False):
    """Run every registry query against its DuckDB oracle at ``sf_dir``
    and return ``(results, failures)``. Reusable across callers that
    hold one SparkSession over many table directories (the fuzzed-table
    sweep in ``tools/fuzz_tables.py`` runs this per seed)."""
    import __spark_entry__ as entry

    only = set(only or ())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    results: dict[str, dict] = {}
    failures = 0
    ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        results[name] = rec
        try:
            sp = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(sp)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"spark error: {e}"
            print(f"[FAIL] {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            # rows-only contract: the driver records a weaker check
            rec.update(
                rows_match=True, schema_match=True, hash_match=None,
            )
            if not quiet:
                print(f"[rows-only] {name}: {len(sp)} rows")
            continue
        try:
            ora = con.execute(oracles[name]).df()
            rec["oracle_rows"] = len(ora)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"oracle error: {e}"
            print(f"[FAIL] {name}: oracle error: {e}")
            failures += 1
            continue
        errs = compare(name, sp, ora)
        rec["rows_match"] = len(sp) == len(ora)
        rec["schema_match"] = sorted(sp.columns) == sorted(ora.columns) and not any(
            "dtype skew" in e for e in errs
        )
        rec["hash_match"] = not errs
        if errs:
            rec["err"] = "; ".join(errs)
            print(f"[FAIL] {name}: " + "; ".join(errs))
            failures += 1
        elif not quiet:
            print(f"[OK]   {name}: {len(sp)} rows")
    con.close()
    print(f"\n{ran}/{len(qs)} queries run, {failures} failures")
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(results, fh, indent=2)
        print(f"wrote {json_out}")
    return results, failures


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    # Partitioning-invariance knobs: the whole registry must produce
    # identical results under a hostile layout — a different shuffle
    # width AND a prime-count repartition of every input table (ordered
    # folds, pre-rounding pins and window tie-breaks are the engine's
    # correctness backbone; two past bugs surfaced ONLY under layout
    # change). Used by the committed CORRECTNESS_full_rNN_altpart.json.
    shuffle_n = 16
    if "--shuffle-partitions" in argv:
        i = argv.index("--shuffle-partitions")
        shuffle_n = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    repart_n = None
    if "--repartition" in argv:
        i = argv.index("--repartition")
        repart_n = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    from financial_data_pipeline_spark import get_spark

    spark = get_spark(shuffle_partitions=shuffle_n)
    spark.sparkContext.setLogLevel("ERROR")
    if repart_n is not None:
        from financial_data_pipeline_spark.plans import driver_queries as _dq

        _orig_load = _dq.load_table

        def _load_repart(spark, sf_dir, name, **kw):
            return _orig_load(spark, sf_dir, name, **kw).repartition(repart_n)

        _dq.load_table = _load_repart
        # patch EVERY namespace that resolves load_table at call time:
        # the SQL front door (view registration) and adapters itself —
        # events_as_ohlcv and friends call the module-global, so the
        # whole bar-query family would otherwise dodge the repartition
        from financial_data_pipeline_spark.plans import sql_frontdoor as _fd
        from financial_data_pipeline_spark.sources import adapters as _ad

        _fd.load_table = _load_repart
        _ad.load_table = _load_repart
    _results, failures = sweep(spark, sf_dir, only=only, json_out=json_out)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
