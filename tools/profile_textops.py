"""Compare token-count / space-count expression variants at sf1."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ensure_sf1  # noqa: E402
from etl_verkada_spark.catalog import table  # noqa: E402
from etl_verkada_spark.session import get_spark  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def t7(mk):
    mk().write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(7):
        t0 = time.perf_counter()
        mk().write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark("profile-textops")
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = ensure_sf1(spark, src)
    d = lambda: table(spark, sf1, "documents")
    d().agg(F.count(F.lit(1))).write.mode("overwrite").format("noop").save()
    for _ in range(4):
        spark.range(1).write.mode("overwrite").format("noop").save()

    variants = {
        "sum_length_only": lambda: d().agg(
            F.sum(F.length("text")).alias("n")
        ),
        "toks_replace": lambda: d().agg(
            F.sum(
                F.length("text")
                - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
                + 1
            ).alias("n")
        ),
        "toks_split_size": lambda: d().agg(
            F.sum(F.size(F.split("text", " "))).alias("n")
        ),
        "toks_regexp_count": lambda: d().agg(
            F.sum(F.regexp_count("text", F.lit(" ")) + 1).alias("n")
        ),
        "pad_regexp_replace": lambda: d().agg(
            F.sum(
                F.length(
                    F.concat(
                        F.lit(" "),
                        F.regexp_replace("text", " ", "  "),
                        F.lit(" "),
                    )
                )
            ).alias("n")
        ),
        "pad_replace": lambda: d().agg(
            F.sum(
                F.length(
                    F.concat(
                        F.lit(" "),
                        F.replace(F.col("text"), F.lit(" "), F.lit("  ")),
                        F.lit(" "),
                    )
                )
            ).alias("n")
        ),
    }
    for k, mk in variants.items():
        print(f"{k:24s} {t7(mk):7.3f}s", flush=True)


if __name__ == "__main__":
    main()
