"""Decompose sf1 query time: scan-only vs full plan, config levers.

Usage: python tools/profile_decompose.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ensure_sf1  # noqa: E402
from etl_verkada_spark.catalog import table  # noqa: E402
from etl_verkada_spark.registry import build_registry  # noqa: E402
from etl_verkada_spark.session import get_spark  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def t5(mk):
    mk().write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        mk().write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark("profile-decompose")
    registry = build_registry()
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = ensure_sf1(spark, src)
    registry["agg_count"].fn(spark, sf1).write.mode("overwrite").format("noop").save()
    for _ in range(4):
        spark.range(1).write.mode("overwrite").format("noop").save()

    li = lambda: table(spark, sf1, "lineitem")
    docs = lambda: table(spark, sf1, "documents")
    o = lambda: table(spark, sf1, "orders")

    results = {}
    results["floor(range1)"] = t5(lambda: spark.range(1))
    results["li_scan_count"] = t5(lambda: li().agg(F.count(F.lit(1)).alias("n")))
    results["li_scan_sum1col"] = t5(
        lambda: li().agg(F.sum("l_quantity").alias("s"))
    )
    results["li_scan_allaggcols"] = t5(
        lambda: li().agg(
            F.sum("l_quantity").alias("a"),
            F.sum("l_extendedprice").alias("b"),
            F.sum("l_discount").alias("c"),
            F.sum("l_tax").alias("d"),
            F.count("l_shipdate").alias("e"),
            F.count("l_returnflag").alias("f"),
            F.count("l_linestatus").alias("g"),
        )
    )
    results["agg_groupby_full"] = t5(
        lambda: registry["agg_groupby"].fn(spark, sf1)
    )
    results["o_scan_count"] = t5(lambda: o().agg(F.count(F.lit(1)).alias("n")))
    results["pivot_full"] = t5(lambda: registry["pivot"].fn(spark, sf1))
    results["docs_scan_count"] = t5(
        lambda: docs().agg(F.count(F.lit(1)).alias("n"))
    )
    results["docs_scan_textlen"] = t5(
        lambda: docs().agg(F.sum(F.length("text")).alias("n"))
    )
    results["llm_text_stats_full"] = t5(
        lambda: registry["llm_text_stats"].fn(spark, sf1)
    )
    results["llm_bm25_full"] = t5(lambda: registry["llm_bm25"].fn(spark, sf1))

    for k, v in results.items():
        print(f"{k:24s} {v:7.3f}s")

    # lever: AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    print("--- AQE off ---")
    for name in ("agg_groupby", "pivot", "llm_text_stats", "llm_bm25"):
        print(f"{name:24s} {t5(lambda: registry[name].fn(spark, sf1)):7.3f}s")
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    # lever: fewer shuffle partitions
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    print("--- shuffle.partitions=8 ---")
    for name in ("agg_groupby", "pivot", "llm_text_stats", "llm_bm25"):
        print(f"{name:24s} {t5(lambda: registry[name].fn(spark, sf1)):7.3f}s")
    spark.conf.set("spark.sql.shuffle.partitions", "64")


if __name__ == "__main__":
    main()
