"""Capture .explain("formatted") output for named registry queries.

Usage:
    python tools/capture_plans.py OUTDIR SUFFIX query [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query, built against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1). Run from the repo
root whose tree you want the plan of (a git worktree of an older commit
gives the "before" plans).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_verkada_spark.registry import build_registry
from etl_verkada_spark.session import get_spark


def formatted_plan(df) -> str:
    """Classic-session fast path via the private explainString helper
    (matches PySpark 4.1's own DataFrame.explain); falls back to
    capturing df.explain('formatted') stdout — version-stable and the
    only option on Spark Connect, where _jdf does not exist (r15
    ADVICE)."""
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception:  # noqa: BLE001 - Connect session / private-API drift
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture-plans")
    registry = build_registry()
    for name in names:
        spec = registry[name]
        try:
            plan = formatted_plan(spec.fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 - record, keep capturing
            plan = f"PLAN CAPTURE FAILED: {exc!r}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
