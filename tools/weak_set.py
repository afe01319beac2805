"""Print the adjudicated bench weak set from a BENCH_FULL record.

The per-round grading question is always the same: which pairs are
>2x floor-adjusted, NOT floor-bound, and what does the record already
say about them (annotation / unstable flag / twin exclusion)? This
reads the committed detail file and answers it in one table, for both
the merged cross-run maps (when present) and the current run.

    python tools/weak_set.py [BENCH_FULL.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
# the in-record floor-band policy — ONE definition, owned by bench.py
# (r14 advice: a local copy could drift from the committed record's
# floor_bound tags)
from bench import FLOOR_BAND_DUCK_S as FLOOR_DUCK_S  # noqa: E402
from bench import FLOOR_BAND_SPARK_S as FLOOR_SPARK_S  # noqa: E402


def weak_rows(queries, duck, floor_s, annotations, unstable):
    rows = []
    for n in sorted(duck, key=lambda n: -(
        max(queries.get(n, 0) - floor_s, 0.0) / duck[n] if duck[n] else 0
    )):
        if n not in queries or duck[n] <= 0:
            continue
        ratio = max(queries[n] - floor_s, 0.0) / duck[n]
        if ratio <= 2.0:
            continue
        floor_bound = (
            queries[n] <= FLOOR_SPARK_S and duck[n] <= FLOOR_DUCK_S
        )
        tags = []
        if floor_bound:
            tags.append("floor-bound")
        if n in (annotations or {}):
            tags.append("annotated")
        if n in (unstable or []):
            tags.append("unstable")
        rows.append((n, ratio, queries[n], duck[n], tags))
    return rows


def report(label, queries, duck, floor_s, annotations, unstable):
    rows = weak_rows(queries, duck, floor_s, annotations, unstable)
    hot = [r for r in rows if "floor-bound" not in r[4]]
    print(f"\n== {label}: {len(hot)} non-floor-bound >2x "
          f"({len(rows) - len(hot)} floor-bound suppressed) ==")
    for n, ratio, s, d, tags in hot:
        print(f"  {n:32s} {ratio:6.2f}x  spark {s:7.3f}  duck {d:7.3f}"
              f"  {','.join(tags) or '-'}")


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL.json"
    with open(path) as f:
        d = json.load(f)
    floor = d.get("spark_fixed_overhead_sec", 0.0)
    s1 = d.get("sf1") or {}
    ann = s1.get("annotations") or {}
    report(
        "sf0.1 (current run)", d.get("queries", {}), d.get("duckdb", {}),
        floor, ann, [],
    )
    if s1.get("queries"):
        report(
            "sf1 (current run)", s1["queries"], s1.get("duckdb", {}),
            floor, ann, s1.get("unstable"),
        )
    m = d.get("merged") or {}
    if m.get("queries"):
        report(
            f"sf0.1 (merged, {d.get('runs_merged')} runs)",
            m["queries"], m.get("duckdb", {}), floor, ann, [],
        )
    ms1 = m.get("sf1") or {}
    if ms1 and ms1.get("queries"):
        report(
            f"sf1 (merged, {d.get('runs_merged')} runs)",
            ms1["queries"], ms1.get("duckdb", {}), floor, ann,
            ms1.get("unstable"),
        )


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `| head` is a normal way to read this
        pass
