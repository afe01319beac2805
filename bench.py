"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Each query executes through a noop sink so
the timing covers the full physical plan (scan -> shuffle -> sink)
without driver-side row serialization skew. A DuckDB run of the same
oracle SQL is timed alongside (informational: the BASELINE target is
"within 2x of DuckDB per query").

Output: {"metric": ..., "value": total_sec, "unit": "sec",
         "queries": {name: sec}, "sf": ..., "duckdb": {name: sec}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_verkada_spark.catalog import TABLES
from etl_verkada_spark.registry import build_registry
from etl_verkada_spark.session import get_spark

#: queries that represent each operator family at scale; quadratic
#: pair-ops (llm_sim_pairs, llm_dedup_ngram) are correctness-scale only.
HEADLINE = [
    "agg_groupby",
    "join_large",
    "join_broadcast_left",
    "flagship_flat",
    "win_rownum",
    "win_frame",
    "topk",
    "dedup_lastwins",
    "upsert_merge",
    "stream_tumble",
    "stream_session",
    "llm_dedup_exact",
    "llm_text_stats",
    "llm_fingerprint",
    "llm_sim_search",
    "udf_pandas",
    "join_asof",
    "join_range",
    "pivot",
    "subquery_exists",
    "agg_stats",
    "win_ntile",
    "llm_dedup_embed",
    "llm_sim_ann_ivf",
    "agg_salted",
    "win_sessionize",
    "ts_gapfill",
    "llm_bm25",
    "mm_feature_extract",
    "mm_feature_extract_arrow",
]


N_RUNS = 3  # min-of-N: sub-second timings carry ~20% scheduler noise


def run_spark(fn, spark, sf_dir: str) -> float:
    """Steady-state timing: one warmup run (JIT + page cache), then the
    MINIMUM of N_RUNS timed runs — min, not mean, because local noise is
    strictly additive (GC, scheduler); the minimum is the plan's cost.

    DuckDB gets the same treatment in run_duckdb for a fair comparison.
    """
    df = fn(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def run_duckdb(con, sql: str) -> float:
    con.execute(sql).fetchall()  # warmup (page cache)
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    registry = build_registry()
    spark = get_spark("etl-verkada-spark-bench")

    # JVM/codegen warmup on an off-headline query
    registry["agg_count"].fn(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    # fixed per-query floor: plan + schedule + noop-commit a 1-row job.
    # Sub-100ms DuckDB queries can never be within 2x of DuckDB at this
    # sf because of it; the ratio signal is in the large-absolute queries.
    spark.range(1).write.mode("overwrite").format("noop").save()
    t0 = time.perf_counter()
    spark.range(1).write.mode("overwrite").format("noop").save()
    floor_s = round(time.perf_counter() - t0, 3)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(run_spark(registry[name].fn, spark, sf_dir), 3)

    duck: dict[str, float] = {}
    try:
        import duckdb

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for name in HEADLINE:
            sql = registry[name].oracle
            if sql:
                duck[name] = round(run_duckdb(con, sql), 3)
    except Exception:
        pass

    # ratio with the fixed per-job floor subtracted: the scale signal
    # (does the PLAN do more work than DuckDB's) as opposed to the raw
    # ratio (which at sub-second local scale mostly measures JVM job
    # orchestration). Clamped at 0 for queries at the floor.
    ratios = {
        n: round(max(timings[n] - floor_s, 0.0) / duck[n], 2)
        for n in duck
        if duck[n] > 0
    }
    print(
        json.dumps(
            {
                "metric": "headline query wall-clock, noop sink, min-of-3",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "duckdb": duck,
                "spark_fixed_overhead_sec": floor_s,
                "ratio_floor_adjusted": ratios,
            }
        )
    )


if __name__ == "__main__":
    main()
