"""Decompose llm_dedup_containment cost at sf0.1 (verdict r14 item 1).

Stages: bare docs scan -> shingle explode -> df attach -> ranked
window -> candidate join -> verify join. Then A/B the current plan
against a checkpoint-reuse rewrite in the same load window.

Usage: python tools/profile_containment.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_verkada_spark.catalog import table  # noqa: E402
from etl_verkada_spark.registry import build_registry  # noqa: E402
from etl_verkada_spark.session import get_spark  # noqa: E402
from etl_verkada_spark.llm.dedup import _doc_shingles, CT_TAU  # noqa: E402
from etl_verkada_spark.llm.text import with_shingles  # noqa: E402

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def t5(mk, n=5):
    mk().write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        mk().write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark("profile-containment")
    registry = build_registry()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry["agg_count"].fn(spark, sf).write.mode("overwrite").format(
        "noop"
    ).save()
    for _ in range(4):
        spark.range(1).write.mode("overwrite").format("noop").save()

    docs = lambda: table(spark, sf, "documents")
    r = {}
    r["floor"] = t5(lambda: spark.range(1))
    r["docs_scan"] = t5(lambda: docs().agg(F.count(F.lit(1)).alias("n")))
    r["shingles_count"] = t5(
        lambda: _doc_shingles(docs()).agg(F.count(F.lit(1)).alias("n"))
    )

    def df_attach():
        sh = _doc_shingles(docs())
        df_ = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
        return sh.join(df_, "s").agg(F.count(F.lit(1)).alias("n"))

    r["df_attach(join)"] = t5(df_attach)

    def df_window():
        sh = _doc_shingles(docs())
        return sh.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("s"))
        ).agg(F.count(F.lit(1)).alias("n"))

    r["df_attach(window)"] = t5(df_window)

    def ranked_cur():
        sh = _doc_shingles(docs())
        df_ = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
        by_doc = Window.partitionBy("doc_id")
        return (
            sh.join(df_, "s")
            .withColumn("sz", F.count(F.lit(1)).over(by_doc))
            .withColumn(
                "r", F.row_number().over(by_doc.orderBy("df", "s"))
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )

    r["ranked(current)"] = t5(ranked_cur)

    r["full(current)"] = t5(lambda: registry["llm_dedup_containment"].fn(spark, sf))

    for k, v in r.items():
        print(f"{k:24s} {v:7.3f}s")


if __name__ == "__main__":
    main()


def decompose_new() -> None:
    spark = get_spark("profile-containment2")
    registry = build_registry()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry["agg_count"].fn(spark, sf).write.mode("overwrite").format(
        "noop"
    ).save()
    for _ in range(4):
        spark.range(1).write.mode("overwrite").format("noop").save()
    docs = lambda: table(spark, sf, "documents")
    r = {}

    def ranked_new():
        sh = _doc_shingles(docs())
        by_s = Window.partitionBy("s")
        by_doc = Window.partitionBy("doc_id")
        return (
            sh.withColumn("df", F.count(F.lit(1)).over(by_s))
            .withColumn("sz", F.count(F.lit(1)).over(by_doc))
            .withColumn("r", F.row_number().over(by_doc.orderBy("df", "s")))
        )

    r["ranked_new_count"] = t5(
        lambda: ranked_new().agg(F.count(F.lit(1)).alias("n"))
    )

    def cands_only():
        ranked = ranked_new().localCheckpoint(eager=False)
        prefix = ranked.filter(
            F.col("r")
            <= F.col("sz") - F.ceil(F.lit(CT_TAU) * F.col("sz")) + 1
        ).select(F.col("doc_id").alias("doc_a"), "s", F.col("sz").alias("sz_a"))
        full = ranked.select(
            F.col("doc_id").alias("doc_b"), "s", F.col("sz").alias("sz_b")
        )
        return (
            prefix.join(full, "s")
            .filter(
                (F.col("doc_a") != F.col("doc_b"))
                & (F.col("sz_b") >= F.ceil(F.lit(CT_TAU) * F.col("sz_a")))
            )
            .select("doc_a", "doc_b")
            .distinct()
        )

    r["cands_only"] = t5(cands_only)

    def arrs_only():
        ranked = ranked_new().localCheckpoint(eager=False)
        return ranked.groupBy("doc_id").agg(
            F.collect_list("s").alias("arr")
        ).agg(F.count(F.lit(1)).alias("n"))

    r["ranked+arrs"] = t5(arrs_only)
    r["full_new"] = t5(lambda: registry["llm_dedup_containment"].fn(spark, sf))
    import duckdb
    from etl_verkada_spark.catalog import TABLES
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    sql = registry["llm_dedup_containment"].oracle
    con.execute(sql).fetchall()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    r["duck_full"] = best
    for k, v in r.items():
        print(f"{k:24s} {v:7.3f}s")


def variants() -> None:
    spark = get_spark("profile-containment3")
    registry = build_registry()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry["agg_count"].fn(spark, sf).write.mode("overwrite").format(
        "noop"
    ).save()
    for _ in range(4):
        spark.range(1).write.mode("overwrite").format("noop").save()
    docs = lambda: table(spark, sf, "documents")
    r = {}

    def hashed_plan(checkpoint=True):
        sh = _doc_shingles(docs()).select(
            "doc_id", F.xxhash64("s").alias("s")
        )
        by_s = Window.partitionBy("s")
        by_doc = Window.partitionBy("doc_id")
        ranked = (
            sh.withColumn("df", F.count(F.lit(1)).over(by_s))
            .withColumn("sz", F.count(F.lit(1)).over(by_doc))
            .withColumn("r", F.row_number().over(by_doc.orderBy("df", "s")))
        )
        if checkpoint:
            ranked = ranked.localCheckpoint(eager=False)
        prefix = ranked.filter(
            F.col("r")
            <= F.col("sz") - F.ceil(F.lit(CT_TAU) * F.col("sz")) + 1
        ).select(F.col("doc_id").alias("doc_a"), "s", F.col("sz").alias("sz_a"))
        full = ranked.select(
            F.col("doc_id").alias("doc_b"), "s", F.col("sz").alias("sz_b")
        )
        cands = (
            prefix.join(full, "s")
            .filter(
                (F.col("doc_a") != F.col("doc_b"))
                & (F.col("sz_b") >= F.ceil(F.lit(CT_TAU) * F.col("sz_a")))
            )
            .select("doc_a", "doc_b")
            .distinct()
        )
        arrs = ranked.groupBy("doc_id").agg(F.collect_list("s").alias("arr"))
        a = arrs.select(
            F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a")
        )
        b = arrs.select(
            F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b")
        )
        inter = F.size(F.array_intersect("arr_a", "arr_b"))
        return (
            cands.join(a, "doc_a")
            .join(b, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                F.expr(
                    "1000000 * size(array_intersect(arr_a, arr_b))"
                    " div size(arr_a)"
                ).alias("containment_ppm"),
                F.size("arr_a").cast("long").alias("n_shingles_a"),
            )
            .filter(inter * 10 >= F.lit(int(CT_TAU * 10)) * F.size("arr_a"))
        )

    r["hashed+ckpt"] = t5(lambda: hashed_plan(True))
    r["hashed_nockpt"] = t5(lambda: hashed_plan(False))
    r["current(str+ckpt)"] = t5(
        lambda: registry["llm_dedup_containment"].fn(spark, sf)
    )
    n = hashed_plan(True).count()
    print("hashed rows:", n)
    m = registry["llm_dedup_containment"].fn(spark, sf).count()
    print("current rows:", m)
    for k, v in r.items():
        print(f"{k:24s} {v:7.3f}s")


def variant_d() -> None:
    spark = get_spark("profile-containment4")
    registry = build_registry()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry["agg_count"].fn(spark, sf).write.mode("overwrite").format(
        "noop"
    ).save()
    for _ in range(4):
        spark.range(1).write.mode("overwrite").format("noop").save()
    docs = lambda: table(spark, sf, "documents")
    r = {}

    def plan_d():
        base = (
            with_shingles(docs())
            .select(
                "doc_id", F.array_distinct("shingles").alias("arr")
            )
            .withColumn("sz", F.size("arr"))
            .localCheckpoint(eager=False)
        )
        sh = base.select("doc_id", "sz", F.explode("arr").alias("s"))
        by_s = Window.partitionBy("s")
        by_doc = Window.partitionBy("doc_id")
        withdf = sh.withColumn("df", F.count(F.lit(1)).over(by_s))
        prefix = (
            withdf.withColumn(
                "r", F.row_number().over(by_doc.orderBy("df", "s"))
            )
            .filter(
                F.col("r")
                <= F.col("sz") - F.ceil(F.lit(CT_TAU) * F.col("sz")) + 1
            )
            .select(
                F.col("doc_id").alias("doc_a"),
                "s",
                F.col("sz").alias("sz_a"),
            )
        )
        full = sh.select(
            F.col("doc_id").alias("doc_b"), "s", F.col("sz").alias("sz_b")
        )
        cands = (
            prefix.join(full, "s")
            .filter(
                (F.col("doc_a") != F.col("doc_b"))
                & (F.col("sz_b") >= F.ceil(F.lit(CT_TAU) * F.col("sz_a")))
            )
            .select("doc_a", "doc_b")
            .distinct()
        )
        a = base.select(
            F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a")
        )
        b = base.select(
            F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b")
        )
        inter = F.size(F.array_intersect("arr_a", "arr_b"))
        return (
            cands.join(a, "doc_a")
            .join(b, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                F.expr(
                    "1000000 * size(array_intersect(arr_a, arr_b))"
                    " div size(arr_a)"
                ).alias("containment_ppm"),
                F.size("arr_a").cast("long").alias("n_shingles_a"),
            )
            .filter(inter * 10 >= F.lit(int(CT_TAU * 10)) * F.size("arr_a"))
        )

    r["variant_d"] = t5(plan_d)
    r["current"] = t5(
        lambda: registry["llm_dedup_containment"].fn(spark, sf)
    )
    print("variant_d rows:", plan_d().count())
    for k, v in r.items():
        print(f"{k:24s} {v:7.3f}s")
