"""Adjudicate bench reproducibility: compare two BENCH detail records
(the full JSON written by bench.py) per query and report whether the two
runs agree within a tolerance (r5 verdict #2: two consecutive full runs
must agree within +-30% per query or the ratios are environment noise,
not measurements).

Usage: python tools/bench_agreement.py run1.json run2.json [tol]

Compares the sf0.1 per-query Spark minima and, when both records carry a
completed sf1 section, the sf1 minima for both engines. Queries flagged
``unstable`` (spread > 2x) in either run are reported separately — their
disagreement is already declared by the record itself.
"""

from __future__ import annotations

import json
import sys


def _section(rec: dict, *path):
    cur = rec
    for p in path:
        if not isinstance(cur, dict) or p not in cur:
            return {}
        cur = cur[p]
    return cur if isinstance(cur, dict) else {}


def compare(a: dict, b: dict, label: str, tol: float, unstable: set):
    rows = []
    for name in sorted(set(a) & set(b)):
        x, y = a[name], b[name]
        if not (isinstance(x, (int, float)) and isinstance(y, (int, float))):
            continue
        if min(x, y) <= 0:
            continue
        rel = max(x, y) / min(x, y) - 1.0
        rows.append((name, x, y, rel))
    bad = [r for r in rows if r[3] > tol and r[0] not in unstable]
    print(f"\n== {label}: {len(rows)} paired, "
          f"{len(bad)} beyond {tol:.0%} (excl. declared-unstable)")
    for name, x, y, rel in sorted(rows, key=lambda r: -r[3]):
        flag = (" UNSTABLE" if name in unstable
                else ("  <-- DISAGREES" if rel > tol else ""))
        print(f"  {name:28s} {x:8.3f} {y:8.3f}  {rel:6.1%}{flag}")
    return len(bad)


def main() -> int:
    p1, p2 = sys.argv[1], sys.argv[2]
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 0.30
    r1 = json.load(open(p1))
    r2 = json.load(open(p2))
    unstable = set(_section(r1, "sf1").get("unstable", []) or []) | set(
        _section(r2, "sf1").get("unstable", []) or []
    )
    n_bad = compare(
        r1.get("queries", {}), r2.get("queries", {}),
        "sf0.1 spark (min)", tol, set(),
    )
    n_bad += compare(
        _section(r1, "sf1", "queries"), _section(r2, "sf1", "queries"),
        "sf1 spark (min)", tol, unstable,
    )
    n_bad += compare(
        _section(r1, "sf1", "duckdb"), _section(r2, "sf1", "duckdb"),
        "sf1 duckdb (min)", tol, unstable,
    )
    print(f"\nverdict: {'AGREE' if n_bad == 0 else f'{n_bad} DISAGREEMENTS'}"
          f" at tol={tol:.0%} (unstable-declared excluded: {sorted(unstable)})")
    return 0 if n_bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
