"""Decompose llm_boilerplate_coverage + llm_dedup_substring (r15
verdict item 6): is the double occ build the constant?

Usage: python tools/profile_boiler.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_verkada_spark.catalog import table  # noqa: E402
from etl_verkada_spark.registry import build_registry  # noqa: E402
from etl_verkada_spark.session import get_spark  # noqa: E402
from etl_verkada_spark.llm.text import BOILER_K, BOILER_MIN_DOCS  # noqa: E402

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


def occ_df(spark, sf):
    K = BOILER_K
    d = table(spark, sf, "documents")
    ws = F.split("text", " ")
    base = d.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_tokens"),
        F.greatest(F.size(ws) - K + 1, F.lit(1)).cast("long")
        .alias("n_windows"),
        ws.alias("w"),
    )
    wins = F.transform(
        F.sequence(F.lit(0), (F.col("n_windows") - 1).cast("int")),
        lambda i: F.array_join(F.slice("w", i + 1, K), " "),
    )
    return base.select(
        "doc_id",
        "n_tokens",
        F.posexplode(wins).alias("w_idx", "win"),
    ).select("doc_id", "n_tokens", "w_idx", F.md5("win").alias("h"))


def ckpt_plan(spark, sf):
    K = BOILER_K
    occ = occ_df(spark, sf).localCheckpoint(eager=False)
    boiler = (
        occ.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= BOILER_MIN_DOCS)
        .select("h")
    )
    matched = occ.join(F.broadcast(boiler), "h")
    seq = Window.partitionBy("doc_id").orderBy("w_idx")
    covered = F.least(
        F.coalesce(F.lead("w_idx").over(seq) - F.col("w_idx"), F.lit(K)),
        F.lit(K),
        (F.col("n_tokens") - F.col("w_idx")).cast("int"),
    )
    per_doc = (
        matched.withColumn("covered", covered)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_boiler_windows"),
            F.sum("covered").cast("long").alias("covered_tokens"),
        )
    )
    d = table(spark, sf, "documents")
    ws = F.split("text", " ")
    return (
        d.select("doc_id", F.size(ws).cast("long").alias("n_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_boiler_windows", F.lit(0))
            .alias("n_boiler_windows"),
            F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
            F.expr(
                "coalesce(covered_tokens, 0) * 1000000 div n_tokens"
            ).alias("coverage_ppm"),
        )
    )


def main() -> None:
    spark = get_spark("profile-boiler")
    registry = build_registry()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry["agg_count"].fn(spark, sf).write.mode("overwrite").format(
        "noop"
    ).save()
    for _ in range(4):
        spark.range(1).write.mode("overwrite").format("noop").save()

    r = {}
    r["occ_build"] = t5(
        lambda: occ_df(spark, sf).agg(F.count(F.lit(1)).alias("n"))
    )
    r["current"] = t5(
        lambda: registry["llm_boilerplate_coverage"].fn(spark, sf)
    )
    r["ckpt"] = t5(lambda: ckpt_plan(spark, sf))
    r["substring_cur"] = t5(
        lambda: registry["llm_dedup_substring"].fn(spark, sf)
    )
    import pandas as pd
    cur = (
        registry["llm_boilerplate_coverage"].fn(spark, sf)
        .orderBy("doc_id").toPandas()
    )
    new = ckpt_plan(spark, sf).orderBy("doc_id").toPandas()
    print("boiler frames equal:", cur.equals(new))

    import duckdb
    from etl_verkada_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    for q in ("llm_boilerplate_coverage", "llm_dedup_substring"):
        sql = registry[q].oracle
        con.execute(sql).fetchall()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        r[f"duck_{q[-12:]}"] = best
    for k, v in r.items():
        print(f"{k:24s} {v:7.3f}s")


if __name__ == "__main__":
    main()


def occ_decompose() -> None:
    spark = get_spark("profile-boiler2")
    registry = build_registry()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry["agg_count"].fn(spark, sf).write.mode("overwrite").format(
        "noop"
    ).save()
    for _ in range(4):
        spark.range(1).write.mode("overwrite").format("noop").save()
    K = BOILER_K
    d = lambda: table(spark, sf, "documents")
    r = {}
    ws = F.split("text", " ")
    r["scan_split_size"] = t5(
        lambda: d().select(F.size(ws).alias("n")).agg(F.sum("n").alias("s"))
    )

    def wins_noexplode():
        base = d().select(
            "doc_id",
            F.greatest(F.size(ws) - K + 1, F.lit(1)).cast("int")
            .alias("n_windows"),
            ws.alias("w"),
        )
        wins = F.transform(
            F.sequence(F.lit(0), F.col("n_windows") - 1),
            lambda i: F.array_join(F.slice("w", i + 1, K), " "),
        )
        return base.select(F.size(wins).alias("n")).agg(
            F.sum("n").alias("s")
        )

    r["wins_build"] = t5(wins_noexplode)

    def wins_explode_nohash():
        base = d().select(
            "doc_id",
            F.greatest(F.size(ws) - K + 1, F.lit(1)).cast("int")
            .alias("n_windows"),
            ws.alias("w"),
        )
        wins = F.transform(
            F.sequence(F.lit(0), F.col("n_windows") - 1),
            lambda i: F.array_join(F.slice("w", i + 1, K), " "),
        )
        return base.select(
            F.posexplode(wins).alias("w_idx", "win")
        ).agg(F.count(F.lit(1)).alias("n"))

    r["wins_explode"] = t5(wins_explode_nohash)

    def wins_md5():
        base = d().select(
            "doc_id",
            F.greatest(F.size(ws) - K + 1, F.lit(1)).cast("int")
            .alias("n_windows"),
            ws.alias("w"),
        )
        wins = F.transform(
            F.sequence(F.lit(0), F.col("n_windows") - 1),
            lambda i: F.array_join(F.slice("w", i + 1, K), " "),
        )
        return base.select(
            F.posexplode(wins).alias("w_idx", "win")
        ).select(F.md5("win").alias("h")).agg(
            F.count(F.lit(1)).alias("n")
        )

    r["wins_md5"] = t5(wins_md5)

    def hash_in_transform():
        base = d().select(
            "doc_id",
            F.greatest(F.size(ws) - K + 1, F.lit(1)).cast("int")
            .alias("n_windows"),
            ws.alias("w"),
        )
        hs = F.transform(
            F.sequence(F.lit(0), F.col("n_windows") - 1),
            lambda i: F.md5(F.array_join(F.slice("w", i + 1, K), " ")),
        )
        return base.select(
            F.posexplode(hs).alias("w_idx", "h")
        ).agg(F.count(F.lit(1)).alias("n"))

    r["md5_in_transform"] = t5(hash_in_transform)
    for k, v in r.items():
        print(f"{k:24s} {v:7.3f}s")


def hashed_windows() -> None:
    spark = get_spark("profile-boiler3")
    registry = build_registry()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry["agg_count"].fn(spark, sf).write.mode("overwrite").format(
        "noop"
    ).save()
    for _ in range(4):
        spark.range(1).write.mode("overwrite").format("noop").save()
    K = BOILER_K
    d = lambda: table(spark, sf, "documents")
    r = {}
    ws = F.split("text", " ")

    def poly_hash():
        base = d().select(
            "doc_id",
            F.greatest(F.size(ws) - K + 1, F.lit(1)).cast("int")
            .alias("n_windows"),
            F.transform(ws, lambda t: F.xxhash64(t)).alias("hw"),
        )
        hs = F.transform(
            F.sequence(F.lit(0), F.col("n_windows") - 1),
            lambda i: F.aggregate(
                F.slice("hw", i + 1, K),
                F.lit(0).cast("long"),
                lambda a, x: a * F.lit(1000003).cast("long") + x,
            ),
        )
        return base.select(
            F.posexplode(hs).alias("w_idx", "h")
        ).agg(F.count(F.lit(1)).alias("n"))

    r["poly_hash_windows"] = t5(poly_hash)

    def str_md5():
        base = d().select(
            "doc_id",
            F.greatest(F.size(ws) - K + 1, F.lit(1)).cast("int")
            .alias("n_windows"),
            ws.alias("w"),
        )
        wins = F.transform(
            F.sequence(F.lit(0), F.col("n_windows") - 1),
            lambda i: F.md5(F.array_join(F.slice("w", i + 1, K), " ")),
        )
        return base.select(
            F.posexplode(wins).alias("w_idx", "h")
        ).agg(F.count(F.lit(1)).alias("n"))

    r["str_md5_windows"] = t5(str_md5)
    for k, v in r.items():
        print(f"{k:24s} {v:7.3f}s")
    sys.stdout.flush()
