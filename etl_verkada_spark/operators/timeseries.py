"""Time-series gap-fill (SURVEY.md §2.5/§2.9 adjacent — the hypertable
rollup shape).

Continuous-aggregate semantics over an irregular event stream: bucket to
a fixed grid, then materialize EVERY grid slot — including empty ones —
with counts zero-filled and the running value forward-filled (LOCF).
Monitoring, billing and feature-store pipelines all need the dense form;
the sparse group-by alone silently drops the empty buckets that usually
matter most (outages look like missing rows, not zeros).

Spark-first construction, no UDFs anywhere:

1. sparse rollup: one hash aggregate on (series, bucket) — exact cents;
2. spine: ``sequence(min_bucket, max_bucket, step)`` exploded from the
   1-row bounds aggregate, cross-joined (broadcast, bounded: n_series x
   n_buckets) with the distinct series keys;
3. left join sparse onto spine (broadcast of the sparse side when small,
   shuffle otherwise — Catalyst's call);
4. LOCF: ``last(value, ignorenulls=True)`` over (series, bucket) rows
   frame — one window pass; leading gaps stay NULL by definition.

At 100 TB the spine is never the problem (grid cardinality ~ series x
slots, independent of event count); the rollup is the same mergeable
aggregate as any group-by, and the LOCF window shuffles the DENSE grid,
not the raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import spec
from .aggregates import scaled_long, unscale

BUCKET_US = 10 * 60 * 1_000_000  # 10-minute grid


def ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    # integer `div`, not `/`: float division of ~1e15 microseconds can
    # round across a bucket edge before the cast; both engines must
    # floor-divide in integers (DuckDB side uses //)
    bucket = (
        F.expr(f"unix_micros(cast(ts as timestamp)) div {BUCKET_US}")
        * F.lit(BUCKET_US)
    )

    sparse = e.groupBy(
        F.col("event_type"), bucket.alias("bucket_us")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(scaled_long("value")).alias("sum_c"),
    )

    bounds = sparse.agg(
        F.min("bucket_us").alias("lo"), F.max("bucket_us").alias("hi")
    )
    buckets = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(BUCKET_US))
        ).alias("bucket_us")
    )
    series = e.select("event_type").distinct()
    spine = series.crossJoin(F.broadcast(buckets))

    dense = spine.join(sparse, ["event_type", "bucket_us"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return dense.select(
        "event_type",
        "bucket_us",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        unscale(F.last("sum_c", ignorenulls=True).over(w), 2).alias(
            "filled_sum"
        ),
    )


ORACLE_TS_GAPFILL = """
WITH sparse AS (
  SELECT
    event_type,
    (epoch_us(ts) // 600000000) * 600000000 AS bucket_us,
    COUNT(*) AS n_events,
    SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS sum_c
  FROM events
  GROUP BY 1, 2
),
bounds AS (
  SELECT MIN(bucket_us) AS lo, MAX(bucket_us) AS hi FROM sparse
),
spine AS (
  SELECT t.event_type, g.bucket_us
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (
    SELECT UNNEST(generate_series(lo, hi, 600000000)) AS bucket_us
    FROM bounds
  ) g
)
SELECT
  s.event_type,
  s.bucket_us,
  COALESCE(p.n_events, 0) AS n_events,
  CAST(CAST(LAST_VALUE(p.sum_c IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.bucket_us
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DECIMAL(38,0)) / 100 AS DOUBLE) AS filled_sum
FROM spine s
LEFT JOIN sparse p USING (event_type, bucket_us)
"""


QUERIES = {
    "ts_gapfill": spec(
        ts_gapfill, ORACLE_TS_GAPFILL, "beyond",
        doc="dense time-grid rollup: zero-filled counts + LOCF values",
    ),
}
