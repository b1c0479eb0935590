"""Per-query bench regression check.

Compares a fresh `bench.py` JSON line (or a saved one) against a prior
round's BENCH_r{N}.json per query — totals are NOT comparable across
rounds because the headline set grows (see BASELINE.md). Exits nonzero
if any common query slowed beyond the threshold ratio. Usage::

    python bench.py 2>/dev/null | grep '^{' | tail -1 > /tmp/bench.json
    python tools/compare_bench.py /tmp/bench.json BENCH_r01.json [ratio]
"""

from __future__ import annotations

import json
import re
import sys


def load_queries(path: str) -> dict[str, float]:
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return {k: float(v) for k, v in d["queries"].items()}
    # driver BENCH_r{N}.json wraps the line in a "tail" string fragment
    if isinstance(d, dict) and "tail" in d:
        raw = d["tail"]
    pairs = re.findall(r'"([a-z0-9_]+)": ([0-9.]+)', raw)
    out = {k: float(v) for k, v in pairs}
    for meta in ("n", "rc", "cpus", "sf", "value"):
        out.pop(meta, None)
    return out


def main() -> None:
    cur_path, base_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    cur, base = load_queries(cur_path), load_queries(base_path)
    common = sorted(k for k in set(cur) & set(base) if base[k] > 0)
    print(f"{len(common)} comparable queries "
          f"({len(cur) - len(common)} new, no baseline)")
    if not common:
        return
    # Noise-aware (see BASELINE.md "sub-second noise floor" and the r6
    # verdict): container-wide drift shows up as the MEDIAN per-query
    # ratio — the inflation index. Flags are normalized by it and gated
    # to >= 1 s (sub-second deltas are noise-floor by definition).
    import statistics

    ratios = {k: cur[k] / base[k] for k in common}
    inflation = statistics.median(ratios.values())
    norm = max(inflation, 1e-9)
    print(f"inflation index (median ratio): {inflation:.3f}x")
    bad = [
        (k, base[k], cur[k])
        for k in common
        if cur[k] >= 1.0 and ratios[k] / norm > ratio
    ]
    worst = sorted(common, key=lambda k: ratios[k], reverse=True)[:5]
    for k in worst:
        print(f"  {k}: {base[k]:.3f}s -> {cur[k]:.3f}s "
              f"({ratios[k]:.2f}x raw, {ratios[k] / norm:.2f}x normalized)")
    if bad:
        print(f"REGRESSIONS (>= 1s and > {ratio}x normalized): {bad}")
        sys.exit(1)
    print(f"no regression >= 1s and beyond {ratio}x normalized")


if __name__ == "__main__":
    main()
