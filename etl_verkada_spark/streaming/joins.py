"""Stream-stream join (SURVEY.md §2.9 — beyond-reference).

The reference joins a scan against an in-memory map built in the same
run (task.ts:114-127). The streaming generalization joins two UNBOUNDED
inputs: each side must buffer candidate matches in the state store, and
the join is only feasible because (a) an equality key partitions the
state (user_id) and (b) an event-time range plus watermarks bound how
long a row can wait for its match — without the range, state grows
forever. This is the attribution-join shape (purchase <- clicks within
the preceding 10 minutes) running as a REAL streaming query.

The registered query executes readStream -> interval join -> memory
sink (availableNow) and is oracle-checked against the equivalent batch
theta-join SQL: on finite input, streaming and batch semantics must
coincide. 100 TB path: state is partitioned by user_id (one shuffle per
side), watermark 30 min bounds per-key buffered rows; skewed users are
the hazard and AQE does not apply inside streaming state — the salting
rewrite (aggregates.agg_salted) is the mitigation.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import spec
from .stateful import events_stream

JOIN_WINDOW = "10 minutes"
WATERMARK = "30 minutes"


def attribution_join(events: DataFrame) -> DataFrame:
    """purchases <- same-user clicks in the preceding JOIN_WINDOW.

    Both sides carry watermarks; the range predicate lets Spark evict a
    buffered click once the purchase-side watermark passes click_ts +
    window (state cleanup is derived from the join condition).
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts").cast("timestamp").alias("click_ts"),
        )
        .withWatermark("click_ts", WATERMARK)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").cast("timestamp").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", WATERMARK)
    )
    return purchases.join(
        clicks,
        (purchases["user_id"] == clicks["user_id"])
        & (clicks["click_ts"] <= purchases["purchase_ts"])
        & (
            clicks["click_ts"]
            > purchases["purchase_ts"] - F.expr(f"INTERVAL {JOIN_WINDOW}")
        ),
    ).select(
        "purchase_id",
        purchases["user_id"].alias("user_id"),
        F.unix_micros(purchases["purchase_ts"]).alias("purchase_ts_us"),
        F.unix_micros(clicks["click_ts"]).alias("click_ts_us"),
    )


def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real streaming execution of the attribution join, oracle-checked
    against the batch theta-join (finite input => identical results)."""
    joined = attribution_join(events_stream(spark, sf_dir))
    qname = f"ssj_{uuid.uuid4().hex[:12]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


ORACLE_STREAM_STREAM_JOIN = """
SELECT
  p.event_id AS purchase_id,
  p.user_id,
  epoch_us(p.ts) AS purchase_ts_us,
  epoch_us(c.ts) AS click_ts_us
FROM events p
JOIN events c
  ON c.user_id = p.user_id
 AND c.event_type = 'click'
 AND c.ts <= p.ts
 AND c.ts > p.ts - INTERVAL '10 minutes'
WHERE p.event_type = 'purchase'
"""


def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join + stateful aggregate (real run).

    The OTHER streaming join shape: one side unbounded (events), one
    side a bounded dimension (nation) re-read per micro-batch. No state
    is kept for the join itself — the static side behaves like a
    broadcast build refreshed each batch (which is also how slowly-
    changing dims get picked up mid-stream) — so unlike the
    stream-stream form no watermark is needed to bound join state; only
    the downstream count aggregate is stateful. This is the streaming
    twin of the flagship's camera->ACL enrichment.
    """
    from ..catalog import table

    ev = events_stream(spark, sf_dir)
    dim = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("nk"), "n_name"
    )
    enriched = ev.withColumn("nk", F.col("user_id") % 25).join(
        F.broadcast(dim), "nk"
    )
    counts = enriched.groupBy("n_name", "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    qname = f"ss_join_{uuid.uuid4().hex[:12]}"
    q = (
        counts.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


ORACLE_STREAM_STATIC_JOIN = """
SELECT n.n_name, e.event_type, COUNT(*) AS n_events
FROM events e
JOIN nation n ON e.user_id % 25 = n.n_nationkey
GROUP BY n.n_name, e.event_type
"""


QUERIES = {
    "stream_static_join": spec(
        stream_static_join, ORACLE_STREAM_STATIC_JOIN, "streaming",
        doc="stream-static broadcast enrichment + stateful agg (real run)",
    ),
    "stream_stream_join": spec(
        stream_stream_join, ORACLE_STREAM_STREAM_JOIN, "beyond",
        doc="stream-stream interval join (watermarked state, real run)",
    ),
}
