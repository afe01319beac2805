"""Correlated / scalar subqueries (beyond-reference).

The reference's only subquery-shaped logic is the ACL membership gate
(task.ts:209-212 — a semi-join, covered by J3). The engine exposes the
full SQL subquery surface through ``spark.sql`` so Catalyst's
decorrelation is exercised end-to-end:

* EXISTS  -> rewritten to a left-semi join (RewriteCorrelatedScalarQuery
  / RewritePredicateSubquery) — same physical plan as J3;
* IN      -> left-semi with null-aware handling;
* scalar  -> one-row aggregate joined as a broadcast (cross) — computed
  once, not per row.

These run as SQL on temp views (the point is the SQL surface; the
DataFrame forms live in joins.py). Temp view names are prefixed to avoid
collisions with other operators sharing the session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import spec


def _view(spark: SparkSession, sf_dir: str, name: str) -> str:
    vname = f"subq_{name}"
    table(spark, sf_dir, name).createOrReplaceTempView(vname)
    return vname


def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one open order (correlated EXISTS).

    Catalyst decorrelates to a left-semi join on c_custkey — verify with
    .explain(): no per-row subquery execution exists in the plan.
    """
    c = _view(spark, sf_dir, "customer")
    o = _view(spark, sf_dir, "orders")
    return spark.sql(f"""
        SELECT c_custkey, c_name
        FROM {c} c
        WHERE EXISTS (
          SELECT 1 FROM {o} o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
        )
    """)


ORACLE_SUBQUERY_EXISTS = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
)
"""


def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems of large parts (uncorrelated IN -> left-semi join)."""
    li = _view(spark, sf_dir, "lineitem")
    p = _view(spark, sf_dir, "part")
    return spark.sql(f"""
        SELECT l_orderkey, l_partkey, l_quantity
        FROM {li}
        WHERE l_partkey IN (SELECT p_partkey FROM {p} WHERE p_size > 40)
    """)


ORACLE_SUBQUERY_IN = """
SELECT l_orderkey, l_partkey, l_quantity
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
"""


def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above half the maximum price (scalar subquery).

    MAX is exact on doubles (no accumulation), so the predicate boundary
    is bit-identical in both engines — the reason this query uses MAX/2
    rather than AVG (an order-sensitive double sum).
    """
    o = _view(spark, sf_dir, "orders")
    return spark.sql(f"""
        SELECT o_orderkey, o_totalprice
        FROM {o}
        WHERE o_totalprice > (SELECT MAX(o_totalprice) / 2 FROM {o})
    """)


ORACLE_SUBQUERY_SCALAR = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT MAX(o_totalprice) / 2 FROM orders)
"""


def subquery_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-2 orders PER customer.

    The per-row-subplan operator (Postgres LATERAL / APPLY): for each
    outer row, the inner SELECT sees that row's columns. Catalyst
    DECORRELATES it — the plan is a window rank over the join, not an
    inner query per customer — which is the entire reason the construct
    survives at 100 TB: the naive per-row execution is O(customers)
    subplans; the decorrelated form is one join + one window. Total
    ordering (price desc, orderkey) makes the top-2 deterministic.
    """
    from ..catalog import table

    table(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders")
    return spark.sql("""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM lat_customer c, LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM lat_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) t
    """)


ORACLE_SUBQUERY_LATERAL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
"""


def subquery_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparison (`> ALL (...)`) — suppliers whose account
    balance beats EVERY rich BUILDING-segment customer balance in the
    same nation (the inner restriction keeps the result non-empty at
    every SF and exercises BOTH arms: nations with no qualifying
    customers take the vacuous-truth path).

    Spark SQL has no ALL/ANY subquery syntax, so this is the manual
    decorrelation Catalyst would have to produce anyway: the correlated
    inner set collapses to one MAX per nation (exact on doubles — no
    accumulation), a broadcast-able grid joins back, and the ALL
    semantics over an EMPTY inner set (vacuously true) survives as the
    left join's NULL arm. One corpus-scale scan per side, one
    nation-sized join — the O(|inner|) per-outer-row evaluation never
    exists.
    """
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    mx = (
        c.filter(
            (F.col("c_mktsegment") == "BUILDING")
            & (F.col("c_acctbal") > 9000.0)
        )
        .groupBy("c_nationkey")
        .agg(F.max("c_acctbal").alias("max_bal"))
    )
    return (
        s.join(F.broadcast(mx),
               s["s_nationkey"] == mx["c_nationkey"], "left")
        .filter(F.col("max_bal").isNull()
                | (F.col("s_acctbal") > F.col("max_bal")))
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    )


ORACLE_SUBQUERY_ALL = """
SELECT s_suppkey, s_name, s_nationkey, s_acctbal
FROM supplier s
WHERE s_acctbal > ALL (
  SELECT c_acctbal FROM customer c
  WHERE c.c_nationkey = s.s_nationkey
    AND c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 9000.0
)
"""


def subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a NULL-tainted subquery — the three-valued-logic
    trap every SQL engine must get right and naive anti-join rewrites
    get wrong: one NULL in the list makes ``x NOT IN (list)`` UNKNOWN
    for every x, so the tainted predicate admits ZERO rows, while the
    null-filtered form is a plain anti join.

    One row pins all three counts side by side: the corpus size, the
    NULL-tainted NOT IN count (must be 0 — Spark plans this as a
    null-aware anti join, NAAJ), and the null-filtered NOT IN count
    (customers with no non-P order — ordinary left-anti). The driver's
    hash check proves both engines implement the same standard
    semantics, which is exactly the property a user migrating
    hand-written SQL onto this engine needs guaranteed.

    At 100 TB: the null-filtered form is a shuffled left-anti join
    (scales like J4); the tainted form degenerates to a broadcast
    nested loop BY SEMANTIC NECESSITY (any NULL anywhere decides every
    row) — the docstring-level advice is what every warehouse gives:
    write NOT EXISTS, which this engine also ships (subquery_exists).
    """
    c = _view(spark, sf_dir, "customer")
    o = _view(spark, sf_dir, "orders")
    return spark.sql(f"""
        SELECT
          (SELECT COUNT(*) FROM {c}) AS n_customers,
          (SELECT COUNT(*) FROM {c} WHERE c_custkey NOT IN
             (SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                          ELSE o_custkey END FROM {o})) AS n_tainted,
          (SELECT COUNT(*) FROM {c} WHERE c_custkey NOT IN
             (SELECT o_custkey FROM {o} WHERE o_orderstatus <> 'P'))
            AS n_filtered
    """)


ORACLE_SUBQUERY_NOT_IN = """
SELECT
  (SELECT COUNT(*) FROM customer) AS n_customers,
  (SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN
     (SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                  ELSE o_custkey END FROM orders)) AS n_tainted,
  (SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN
     (SELECT o_custkey FROM orders WHERE o_orderstatus <> 'P'))
    AS n_filtered
"""


QUERIES = {
    "subquery_exists": spec(
        subquery_exists, ORACLE_SUBQUERY_EXISTS, "beyond",
        doc="correlated EXISTS, decorrelated to left-semi",
    ),
    "subquery_in": spec(
        subquery_in, ORACLE_SUBQUERY_IN, "beyond",
        doc="IN-subquery -> null-aware left-semi",
    ),
    "subquery_scalar": spec(
        subquery_scalar, ORACLE_SUBQUERY_SCALAR, "beyond",
        doc="scalar subquery computed once (broadcast)",
    ),
    "subquery_lateral": spec(
        subquery_lateral, ORACLE_SUBQUERY_LATERAL, "beyond",
        doc="correlated LATERAL top-N per row, decorrelated by Catalyst",
    ),
    "subquery_all": spec(
        subquery_all, ORACLE_SUBQUERY_ALL, "beyond",
        doc="quantified > ALL comparison, manually decorrelated to "
            "max-grid + null-armed left join",
    ),
    "subquery_not_in": spec(
        subquery_not_in, ORACLE_SUBQUERY_NOT_IN, "beyond",
        doc="NOT IN three-valued-logic trap: NULL-tainted list admits "
            "zero rows (null-aware anti join) vs the filtered anti join",
    ),
}
