"""Compare bm25 base-projection variants (dl + tf0..tf2) at sf1."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ensure_sf1  # noqa: E402
from etl_verkada_spark.catalog import table  # noqa: E402
from etl_verkada_spark.session import get_spark  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

TERMS = ("query", "table", "spark")


def t7(mk):
    mk().write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(7):
        t0 = time.perf_counter()
        mk().write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def agg_all(df):
    return df.agg(
        F.sum("dl").alias("a"),
        *[F.sum(f"tf{i}").alias(f"b{i}") for i in range(len(TERMS))],
    )


def main() -> None:
    spark = get_spark("profile-bm25")
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = ensure_sf1(spark, src)
    d = lambda: table(spark, sf1, "documents")
    d().agg(F.count(F.lit(1))).write.mode("overwrite").format("noop").save()
    for _ in range(4):
        spark.range(1).write.mode("overwrite").format("noop").save()

    def pad_regexp():
        padded = F.concat(
            F.lit(" "), F.regexp_replace("text", " ", "  "), F.lit(" ")
        )
        tf = [
            (
                (
                    F.length(padded)
                    - F.length(F.replace(padded, F.lit(f" {t} "), F.lit("")))
                )
                / F.lit(len(t) + 2)
            ).cast("int").alias(f"tf{i}")
            for i, t in enumerate(TERMS)
        ]
        dl = (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        ).cast("int")
        return agg_all(d().select(dl.alias("dl"), *tf))

    def pad_plain():
        padded = F.concat(
            F.lit(" "), F.replace(F.col("text"), F.lit(" "), F.lit("  ")), F.lit(" ")
        )
        tf = [
            (
                (
                    F.length(padded)
                    - F.length(F.replace(padded, F.lit(f" {t} "), F.lit("")))
                )
                / F.lit(len(t) + 2)
            ).cast("int").alias(f"tf{i}")
            for i, t in enumerate(TERMS)
        ]
        dl = (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        ).cast("int")
        return agg_all(d().select(dl.alias("dl"), *tf))

    def split_remove():
        ws = F.split("text", " ")
        tf = [
            (F.size(ws) - F.size(F.array_remove(ws, t))).alias(f"tf{i}")
            for i, t in enumerate(TERMS)
        ]
        return agg_all(d().select(F.size(ws).alias("dl"), *tf))

    def split_filter():
        ws = F.split("text", " ")
        tf = [
            F.size(F.filter(ws, lambda w: w == F.lit(t))).alias(f"tf{i}")
            for i, t in enumerate(TERMS)
        ]
        return agg_all(d().select(F.size(ws).alias("dl"), *tf))

    for k, mk in {
        "pad_regexp(current)": pad_regexp,
        "pad_plain": pad_plain,
        "split_array_remove": split_remove,
        "split_hof_filter": split_filter,
    }.items():
        print(f"{k:24s} {t7(mk):7.3f}s", flush=True)


if __name__ == "__main__":
    main()
