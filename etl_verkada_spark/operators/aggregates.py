"""Aggregations (reference A1/A2 + the full beyond-reference family).

The reference's aggregation surface is exactly: a COUNT used as loop
control (task.ts:127) and a distinct-set accumulator (task.ts:198,214).
The engine exposes Spark's full hash-aggregate family; Catalyst always
plans partial (map-side combine) + final aggregation, so a group-by over
100 TB shuffles only one row per (partition, group), not the data.

Float determinism: SUM(double) is order-sensitive, and the DuckDB oracle
would disagree in the last ulp. Every money/quantity sum is computed as
SUM(CAST(x AS DECIMAL(...))) — exact, associative, order-insensitive —
and cast back to DOUBLE at the end; both engines then produce
bit-identical values. Averages are derived as decimal-sum / count in
double, never AVG(double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import spec


def dec_sum(col: str, scale: str = "decimal(28,2)", alias: str | None = None):
    """Order-insensitive SUM of a double column via decimal."""
    c = F.sum(F.col(col).cast(scale)).cast("double")
    return c.alias(alias) if alias else c


def agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: COUNT consumed by control flow (pagination bound, task.ts:127)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_discount") > F.lit(0.02)).agg(
        F.count(F.lit(1)).alias("cnt")
    )


ORACLE_AGG_COUNT = """
SELECT COUNT(*) AS cnt FROM lineitem WHERE l_discount > 0.02
"""


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: distinct-set accumulation (the Set<string> at task.ts:198,214)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


ORACLE_AGG_DISTINCT = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (count form): COUNT(DISTINCT) per group — expands to a two-phase
    aggregate in Spark (distinct shuffle then count), exact."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_custs")
    )


ORACLE_AGG_COUNT_DISTINCT = """
SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_custs
FROM orders GROUP BY o_orderstatus
"""


def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-reference: TPC-H Q1-shaped pricing summary.

    The canonical hash-aggregate benchmark: filter -> group -> 6 aggs.
    All double sums routed through DECIMAL (see module docstring); the
    per-row product expression stays double (deterministic per row) and
    is rounded to a fixed scale *before* the sum so both engines add
    identical decimals.
    """
    li = table(spark, sf_dir, "lineitem")
    # Inputs have <= 2 true decimals, so double->decimal casts are
    # boundary-free; all products then happen in exact decimal arithmetic
    # (disc_price scale 4, charge scale 6) identically in both engines.
    price_d = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_d = F.col("l_discount").cast("decimal(4,2)")
    tax_d = F.col("l_tax").cast("decimal(4,2)")
    disc_price = price_d * (F.lit(1).cast("decimal(3,2)") - disc_d)
    charge = disc_price * (F.lit(1).cast("decimal(3,2)") + tax_d)
    filtered = li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    grouped = filtered.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(28,4)")).cast("double").alias("sum_qty"),
        F.sum(price_d).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return grouped.withColumn(
        "avg_qty", F.col("sum_qty") / F.col("count_order")
    ).withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))


ORACLE_AGG_GROUPBY = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(4,2)))
           * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
  COUNT(*) AS count_order,
  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-reference: ROLLUP over the region->nation hierarchy."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    j = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return j.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.sum(F.col("c_acctbal").cast("decimal(28,2)")).cast("double").alias("sum_bal"),
    )


ORACLE_AGG_ROLLUP = """
SELECT
  r_name,
  n_name,
  COUNT(*) AS n_custs,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS sum_bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-reference: CUBE over orders dimensions."""
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(28,2)")).cast("double").alias("sum_price"),
    )


ORACLE_AGG_CUBE = """
SELECT
  o_orderstatus,
  o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-reference (rows-only): HyperLogLog++ approximate distinct.

    Sketch-based — the 100 TB answer to COUNT(DISTINCT) when 2% error is
    acceptable: one pass, fixed memory, mergeable partials, no distinct
    shuffle. Not oracle-checkable (DuckDB's approx sketch differs), so
    rows-only; the exact companion is agg_count_distinct.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


QUERIES = {
    "agg_count": spec(
        agg_count, ORACLE_AGG_COUNT, "reference:A1",
        doc="COUNT as control flow, task.ts:127",
    ),
    "agg_distinct": spec(
        agg_distinct, ORACLE_AGG_DISTINCT, "reference:A2",
        doc="distinct-set accumulation, task.ts:198,214",
    ),
    "agg_count_distinct": spec(
        agg_count_distinct, ORACLE_AGG_COUNT_DISTINCT, "reference:A2",
        doc="exact COUNT(DISTINCT) per group",
    ),
    "agg_groupby": spec(
        agg_groupby, ORACLE_AGG_GROUPBY, "beyond",
        doc="TPC-H Q1-shaped hash aggregate, decimal-exact",
    ),
    "agg_rollup": spec(
        agg_rollup, ORACLE_AGG_ROLLUP, "beyond",
        doc="ROLLUP hierarchy aggregate",
    ),
    "agg_cube": spec(
        agg_cube, ORACLE_AGG_CUBE, "beyond",
        doc="CUBE aggregate",
    ),
    "agg_approx": spec(
        agg_approx, None, "beyond",
        doc="HLL++ approx distinct (rows-only; sketch differs from DuckDB)",
    ),
}
