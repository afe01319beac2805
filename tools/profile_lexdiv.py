"""A/B llm_lexical_diversity (sf1 2.06x boundary row, r15 verdict
item 9): current two-exchange form vs repartition-by-doc-pre-explode
(the llm_tfidf one-exchange lesson). Also re-times
graph_label_propagation on the improved _edges build.

Usage: python tools/profile_lexdiv.py
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


def t5(mk, n=5):
    mk().write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        mk().write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def lexdiv_repart(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    counts = (
        d.repartition("doc_id")
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
    )
    return per.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.expr("n_distinct * 1000000 div n_tokens").alias("ttr_ppm"),
        F.expr(
            "(n_tokens * n_tokens - sum_c2) * 1000000"
            " div (n_tokens * n_tokens)"
        ).alias("simpson_ppm"),
    )


def main() -> None:
    spark = get_spark("profile-lexdiv")
    registry = build_registry()
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = ensure_sf1(spark, src)
    registry["agg_count"].fn(spark, sf1).write.mode("overwrite").format(
        "noop"
    ).save()
    for _ in range(4):
        spark.range(1).write.mode("overwrite").format("noop").save()

    r = {}
    r["lexdiv_current"] = t5(
        lambda: registry["llm_lexical_diversity"].fn(spark, sf1)
    )
    r["lexdiv_repart"] = t5(lambda: lexdiv_repart(spark, sf1))
    r["lexdiv_current2"] = t5(
        lambda: registry["llm_lexical_diversity"].fn(spark, sf1)
    )
    r["lpa_current"] = t5(
        lambda: registry["graph_label_propagation"].fn(spark, sf1), n=3
    )

    import duckdb
    from etl_verkada_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{sf1}/{t}.parquet/*.parquet'"
        )
    for q in ("llm_lexical_diversity", "graph_label_propagation"):
        sql = registry[q].oracle
        con.execute(sql).fetchall()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        r[f"duck_{q.split('_')[-1]}"] = best
    for k, v in r.items():
        print(f"{k:24s} {v:7.3f}s")


if __name__ == "__main__":
    main()
