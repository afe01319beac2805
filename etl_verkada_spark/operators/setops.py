"""Set operations (SURVEY.md §2.7 — beyond-reference).

UNION DISTINCT / INTERSECT / EXCEPT each plan as a hash aggregate or
join over the shuffled key set; partial aggregation keeps the shuffle
proportional to distinct keys, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import spec


def _cust_keys(spark, sf_dir) -> DataFrame:
    return table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key")
    )


def _order_keys(spark, sf_dir) -> DataFrame:
    return table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT of customer keys and order customer keys."""
    return _cust_keys(spark, sf_dir).union(_order_keys(spark, sf_dir)).distinct()


ORACLE_SET_UNION = """
SELECT c_custkey AS key FROM customer
UNION
SELECT o_custkey AS key FROM orders
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers that actually placed orders."""
    return _cust_keys(spark, sf_dir).intersect(_order_keys(spark, sf_dir))


ORACLE_SET_INTERSECT = """
SELECT c_custkey AS key FROM customer
INTERSECT
SELECT o_custkey AS key FROM orders
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers with no orders (relational anti-join twin).

    ``subtract`` is SQL EXCEPT (distinct) semantics; ``exceptAll`` would
    be EXCEPT ALL (bag difference) and disagrees when a key occurs on
    both sides with different multiplicities.
    """
    return _cust_keys(spark, sf_dir).subtract(_order_keys(spark, sf_dir))


ORACLE_SET_EXCEPT = """
SELECT c_custkey AS key FROM customer
EXCEPT
SELECT o_custkey AS key FROM orders
"""


def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: bag difference — each order 'consumes' one occurrence.

    Distinct-set EXCEPT (above) can't express per-occurrence accounting;
    bag semantics matter whenever multiplicity is data (inventory,
    retries, quota). Spark plans exceptAll as a counted anti-join
    (generate + aggregate), one shuffle.
    """
    return _order_keys(spark, sf_dir).exceptAll(_cust_keys(spark, sf_dir))


ORACLE_SET_EXCEPT_ALL = """
SELECT o_custkey AS key FROM orders
EXCEPT ALL
SELECT c_custkey AS key FROM customer
"""


def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: bag intersection, min of the two multiplicities."""
    return _order_keys(spark, sf_dir).intersectAll(_cust_keys(spark, sf_dir))


ORACLE_SET_INTERSECT_ALL = """
SELECT o_custkey AS key FROM orders
INTERSECT ALL
SELECT c_custkey AS key FROM customer
"""


QUERIES = {
    "set_union": spec(
        set_union, ORACLE_SET_UNION, "beyond", doc="UNION DISTINCT"
    ),
    "set_intersect": spec(
        set_intersect, ORACLE_SET_INTERSECT, "beyond", doc="INTERSECT"
    ),
    "set_except": spec(
        set_except, ORACLE_SET_EXCEPT, "beyond", doc="EXCEPT"
    ),
    "set_except_all": spec(
        set_except_all, ORACLE_SET_EXCEPT_ALL, "beyond",
        doc="EXCEPT ALL (bag difference, counted anti-join)",
    ),
    "set_intersect_all": spec(
        set_intersect_all, ORACLE_SET_INTERSECT_ALL, "beyond",
        doc="INTERSECT ALL (bag intersection)",
    ),
}
