"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and (when an oracle exists) the
oracle SQL on DuckDB over the same parquet tables, then compares
row count, column names and an order-insensitive multiset of
canonicalized row values. Usage:

    python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback
from collections import Counter

import duckdb

sys.path.insert(0, "/root/repo")

from etl_verkada_spark.catalog import TABLES
from etl_verkada_spark.registry import build_registry
from etl_verkada_spark.session import get_spark


def canon(v) -> str:
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rows_to_multiset(rows, col_order):
    return Counter(
        tuple(canon(row[i]) for i in col_order) for row in rows
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    registry = build_registry()
    spark = get_spark("parity-check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, q in sorted(registry.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception:
            failures.append(name)
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            continue
        if q.oracle is None:
            print(
                f"ok*   {name}: rows-only, {len(srows)} rows "
                f"({time.time() - t0:.1f}s)"
            )
            continue
        try:
            res = con.execute(q.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            s_order = [scols.index(c) for c in sorted(scols)]
            o_order = [ocols.index(c) for c in sorted(ocols)]
            sm = rows_to_multiset([tuple(r) for r in srows], s_order)
            om = rows_to_multiset(orows, o_order)
            if sm != om:
                extra_s = list((sm - om).items())[:3]
                extra_o = list((om - sm).items())[:3]
                problems.append(
                    f"values differ; spark-only={extra_s} oracle-only={extra_o} "
                    f"(cols={sorted(scols)})"
                )
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + " | ".join(problems))
        else:
            print(f"PASS  {name}: {len(srows)} rows ({time.time() - t0:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
