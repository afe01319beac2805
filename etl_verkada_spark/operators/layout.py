"""Data-layout maintenance: multi-dimensional (Z-order) clustering.

Beyond-reference (the reference rewrites nothing it lands,
task.ts:200-238 posts straight to the sink): the lakehouse maintenance
pass that co-locates rows that are close in SEVERAL filter dimensions,
so min/max row-group pruning works for predicates on either column —
the standard technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Mechanics: interleave the bits of the (normalized) cluster keys into a
single Morton code ``z``, then range-partition the table by ``z`` and
write one file per range. Rows whose keys are near each other in BOTH
dimensions land in the same file, and each file's (min, max) envelope
per dimension stays tight — the property the audit query below
measures and the oracle re-derives.

100 TB path: the z-value is a pure per-row expression (no shuffle to
compute); the clustering itself is ONE range exchange, exactly like a
global sort. The audit here must match the oracle's exact NTILE file
assignment (the correctness gate hashes values), so it computes the
global position with ``bucketed_global_rank`` — quantile buckets on
``z`` + driver prefix-sum + bucket-partitioned row_number, no
single-task WindowExec — and derives the equal-size file id from the
position with NTILE's own ceil/floor split arithmetic. Production
writes use ``df.repartitionByRange(n, "z").sortWithinPartitions("z")``
and accept boundary jitter (per-file stats, not row hashes, are the
contract there).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import spec
from .sorts import bucketed_global_rank

#: bits per dimension in the Morton code. 16 covers key domains to 65k;
#: real deployments first rank/bucket arbitrary domains down to 2^bits.
Z_BITS = 16
Z_BUCKETS = 16


def morton_col(x: str, y: str, bits: int = Z_BITS) -> Column:
    """Bit-interleaved Morton code: x occupies even bits, y odd bits.

    A chain of 2*bits shift/mask terms — all integer ops inside one
    codegen'd project, no UDF.
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(
            F.shiftright(F.col(x).cast("long"), i).bitwiseAND(F.lit(1)),
            2 * i,
        )
        z = z + F.shiftleft(
            F.shiftright(F.col(y).cast("long"), i).bitwiseAND(F.lit(1)),
            2 * i + 1,
        )
    return z


def morton_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    """The identical Morton arithmetic as engine-portable SQL text."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def maintain_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering audit over lineitem (l_partkey, l_suppkey).

    Computes the Morton code, assigns each row to one of ``Z_BUCKETS``
    equal-size output files, and reports each file's row count and
    per-dimension (min, max) envelope: the numbers a reader's pruning
    would use.

    The equal-size assignment is NTILE over a 6-column total order, but
    computed WITHOUT a single-task window: ``bucketed_global_rank``
    gives each row its global position ``pos`` (quantile buckets on
    ``z`` + prefix-sum offsets; z is the leading sort key so the
    bucketing is order-monotone), and the file id is then NTILE's own
    split arithmetic on ``pos`` — the first ``n mod k`` files take
    ``ceil(n/k)`` rows, the rest ``floor(n/k)`` — as a pure literal
    expression. Bit-identical to the oracle's NTILE, no unpartitioned
    WindowExec in the plan.
    """
    li = table(spark, sf_dir, "lineitem")
    z = morton_col("l_partkey", "l_suppkey")
    ranked = bucketed_global_rank(
        li.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                  "l_quantity", z.alias("z")),
        "z",
        [F.col(c) for c in ("z", "l_orderkey", "l_linenumber", "l_partkey",
                            "l_suppkey", "l_quantity")],
    )
    n = ranked._bucketed_rank_total  # type: ignore[attr-defined]
    q, r = divmod(n, Z_BUCKETS)
    boundary = r * (q + 1)  # rows in the ceil-sized leading files
    # integer `div` keeps the assignment exact at any n (float division
    # would drift past 2^53 positions)
    file_id = F.expr(
        f"CAST(CASE WHEN pos <= {boundary} THEN (pos - 1) div {q + 1} "
        f"ELSE {r} + (pos - 1 - {boundary}) div {max(q, 1)} END AS INT) + 1"
    )
    bucketed = ranked.withColumn("file_id", file_id)
    return bucketed.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("z").alias("z_min"),
        F.max("z").alias("z_max"),
        F.min("l_partkey").alias("part_min"),
        F.max("l_partkey").alias("part_max"),
        F.min("l_suppkey").alias("supp_min"),
        F.max("l_suppkey").alias("supp_max"),
    )


ORACLE_MAINTAIN_ZORDER = f"""
WITH z AS (
  SELECT
    l_partkey, l_suppkey,
    {morton_sql("l_partkey", "l_suppkey")} AS z,
    NTILE({Z_BUCKETS}) OVER (
      ORDER BY {morton_sql("l_partkey", "l_suppkey")},
               l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
    ) AS file_id
  FROM lineitem
)
SELECT
  file_id,
  COUNT(*) AS n_rows,
  MIN(z) AS z_min,
  MAX(z) AS z_max,
  MIN(l_partkey) AS part_min,
  MAX(l_partkey) AS part_max,
  MIN(l_suppkey) AS supp_min,
  MAX(l_suppkey) AS supp_max
FROM z
GROUP BY file_id
"""


QUERIES = {
    "maintain_zorder": spec(
        maintain_zorder, ORACLE_MAINTAIN_ZORDER, "beyond",
        doc="Z-order clustering audit: Morton code + per-file envelopes",
    ),
}
