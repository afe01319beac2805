"""Reshape operators: pivot / unpivot (beyond-reference).

The reference has no reshaping (its one projection is row-wise,
task.ts:168-195). The engine ships both directions:

* ``pivot`` — long -> wide. Spark's ``groupBy().pivot(col, values)``
  compiles to ONE hash aggregate with a conditional-aggregation
  expression per pivot value: no extra shuffle versus a plain group-by,
  which is why the explicit value list matters at 100 TB (without it
  Spark runs a distinct-scan job first to discover the values).
* ``unpivot`` — wide -> long via ``DataFrame.unpivot`` (SQL ``UNPIVOT``/
  ``stack``): a narrow per-row expansion, no shuffle at all.

Oracles are the portable relational forms: conditional aggregation for
pivot, UNION ALL for unpivot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import spec
from .aggregates import scaled_long, unscale

PIVOT_STATUSES = ["O", "F", "P"]  # o_orderstatus domain


def pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts and exact revenue per priority, one column per status.

    The explicit ``PIVOT_STATUSES`` list keeps the plan single-pass (see
    module docstring); sums run on exact cents (aggregates.py).
    """
    o = table(spark, sf_dir, "orders")
    wide = (
        o.withColumn("price_c", scaled_long("o_totalprice"))
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", PIVOT_STATUSES)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("price_c").alias("rev_c"),
        )
    )
    cols = [F.col("o_orderpriority")]
    for s in PIVOT_STATUSES:
        cols.append(F.coalesce(F.col(f"{s}_cnt"), F.lit(0)).alias(f"cnt_{s}"))
        cols.append(
            unscale(F.coalesce(F.col(f"{s}_rev_c"), F.lit(0)), 2).alias(
                f"rev_{s}"
            )
        )
    return wide.select(*cols)


ORACLE_PIVOT = """
SELECT
  o_orderpriority,
  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS cnt_O,
  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
                FILTER (WHERE o_orderstatus = 'O'), 0) AS DOUBLE) AS rev_O,
  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS cnt_F,
  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
                FILTER (WHERE o_orderstatus = 'F'), 0) AS DOUBLE) AS rev_F,
  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS cnt_P,
  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
                FILTER (WHERE o_orderstatus = 'P'), 0) AS DOUBLE) AS rev_P
FROM orders
GROUP BY o_orderpriority
"""


def unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part metrics wide -> long: (p_partkey, metric, value)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    ).unpivot(
        ids=["p_partkey"],
        values=["size", "retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    )


ORACLE_UNPIVOT = """
SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
"""


QUERIES = {
    "pivot": spec(
        pivot, ORACLE_PIVOT, "beyond",
        doc="long->wide conditional aggregation (single-pass pivot)",
    ),
    "unpivot": spec(
        unpivot, ORACLE_UNPIVOT, "beyond",
        doc="wide->long UNPIVOT/stack expansion",
    ),
}
