"""Sorts, limits, top-k (reference L1/L2 + beyond, SURVEY.md §2.6).

Scale notes:

* ``topk`` compiles to TakeOrderedAndProject — each partition keeps a
  k-sized heap, the driver merges k*partitions rows; no global sort.
* ``sort_orderby`` materializes a global ordering via a range-partitioned
  sort (Spark samples split points). The position column uses a single
  global window — fine for dimension-sized data, flagged as such;
  fact-scale ranking should use zipWithIndex-style per-partition offsets.
* ``limit_offset`` is the reference's page-size LIMIT (L1); OFFSET at
  scale is an anti-pattern (see operators/scans.py keyset form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import spec


def sort_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY with explicit null placement + position column.

    The unpartitioned window is the operator's SEMANTICS (total-order
    position), and at this SF one task is the right plan. At 100 TB the
    same result is computed in two passes with no single-task sort:
    ``repartitionByRange(cols).sortWithinPartitions(cols)``, count rows
    per partition, broadcast the prefix-sum offsets, and add each
    partition's offset to its local row_number (see SCALE.md §5).
    """
    c = table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc_nulls_last(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.row_number().over(w).alias("pos"),
    )


ORACLE_SORT_ORDERBY = """
SELECT
  c_custkey,
  c_acctbal,
  ROW_NUMBER() OVER (ORDER BY c_acctbal DESC NULLS LAST, c_custkey) AS pos
FROM customer
"""


def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: orderBy().limit(k) -> TakeOrderedAndProject (heap per
    partition, no global sort)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


ORACLE_TOPK = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1: the reference's page-size LIMIT (50/page, task.ts:119)."""
    c = table(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_name")
        .orderBy("c_custkey")
        .offset(5)
        .limit(20)
    )


ORACLE_LIMIT_OFFSET = """
SELECT c_custkey, c_name FROM customer ORDER BY c_custkey LIMIT 20 OFFSET 5
"""


#: rows kept per (lang, source) group
TOPN_PER_KEY = 5


def sort_topn_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N rows per key — "keep the 5 longest documents per
    (lang, source)", the standard curation shape for per-source caps in
    training-data pipelines (and the grouped cousin of ``topk``).

    Expressed as a rank-filtered window, which Spark compiles to
    WindowGroupLimit: each map task keeps only N rows per key BEFORE
    the shuffle (Spark 3.5+ rank-limit pushdown), so the exchange
    carries at most N*keys*partitions rows instead of the table —
    the grouped analogue of TakeOrderedAndProject's per-partition
    heap. Verified in the plan (tests/test_relational.py): a
    ``WindowGroupLimit`` node appears below the Exchange. The ordering
    is total ((n_chars DESC, doc_id) — doc_id is unique), so the kept
    set is deterministic.

    At 100 TB: no global sort, no skew trap — a hot key still sends
    only N rows per map task. Contrast with groupBy+collect_list+
    slice, which shuffles every row of the hot key to one reducer.
    """
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang", "source", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPN_PER_KEY)
    )


ORACLE_SORT_TOPN_PER_KEY = f"""
SELECT doc_id, lang, source, n_chars, rn FROM (
  SELECT
    doc_id, lang, source, n_chars,
    ROW_NUMBER() OVER (
      PARTITION BY lang, source ORDER BY n_chars DESC, doc_id
    ) AS rn
  FROM documents
) WHERE rn <= {TOPN_PER_KEY}
"""


QUERIES = {
    "sort_orderby": spec(
        sort_orderby, ORACLE_SORT_ORDERBY, "beyond",
        doc="global sort with null placement + position",
    ),
    "topk": spec(
        topk, ORACLE_TOPK, "beyond",
        doc="top-k via TakeOrderedAndProject",
    ),
    "limit_offset": spec(
        limit_offset, ORACLE_LIMIT_OFFSET, "reference:L1",
        doc="page-size limit/offset, task.ts:119",
    ),
    "sort_topn_per_key": spec(
        sort_topn_per_key, ORACLE_SORT_TOPN_PER_KEY, "beyond",
        doc="top-N per key via WindowGroupLimit (map-side rank pushdown)",
    ),
}
