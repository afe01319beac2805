"""Event-time windows over the ``events`` table (SURVEY.md §2.9).

The reference's only streaming construct is the scheduled re-invocation
of the whole job (Lambda schedule, task.ts:76) — Spark's
``trigger(availableNow=True)`` micro-batch. The engine adds the real
event-time family: tumbling / sliding / session windows, watermarks and
late-data handling. Each operator is defined as a *transformation
builder* applied to either a batch or a streaming DataFrame — identical
semantics in both modes (the batch mode is what the DuckDB oracle
checks; the streaming mode is exercised in tests via ``readStream`` +
``availableNow``).

Window starts are returned as epoch microseconds (``*_us``) so the
oracle comparison is precision-exact regardless of timestamp type
plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.aggregates import scaled_long, unscale
from ..registry import spec


def tumbling(events: DataFrame, width: str = "10 minutes") -> DataFrame:
    win = F.window(F.col("ts"), width)
    return (
        events.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            unscale(F.sum(scaled_long("value")), 2).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start").cast("timestamp")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute windows per event type (batch-mode check)."""
    return tumbling(table(spark, sf_dir, "events"))


ORACLE_STREAM_TUMBLE = """
SELECT
  epoch_us(time_bucket(INTERVAL '10 minutes', ts)) AS window_start_us,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


def sliding(events: DataFrame, width: str = "10 minutes",
            slide: str = "5 minutes") -> DataFrame:
    win = F.window(F.col("ts"), width, slide)
    return (
        events.groupBy(win.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros(F.col("w.start").cast("timestamp")).alias("window_start_us"),
            "n_events",
        )
    )


def stream_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min width, 5 min slide): each event lands in
    width/slide windows — Spark explodes assignments internally; the
    oracle reproduces that with a union of the two phase-shifted bucket
    families."""
    return sliding(table(spark, sf_dir, "events"))


ORACLE_STREAM_SLIDE = """
WITH assigns AS (
  SELECT epoch_us(time_bucket(INTERVAL '10 minutes', ts)) AS window_start_us
  FROM events
  UNION ALL
  SELECT epoch_us(time_bucket(INTERVAL '10 minutes', ts,
                              INTERVAL '5 minutes')) AS window_start_us
  FROM events
)
SELECT window_start_us, COUNT(*) AS n_events
FROM assigns
GROUP BY 1
"""


def session(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    win = F.session_window(F.col("ts"), gap)
    return (
        events.groupBy(win.alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros(F.col("w.start").cast("timestamp")).alias("session_start_us"),
            "user_id",
            "n_events",
        )
    )


def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user, 30-minute gap.

    Spark merges an event into the session iff it starts before the
    current session end (strictly less than gap after the previous
    event); the oracle's gaps-and-islands break condition is therefore
    ``diff >= gap``.
    """
    return session(table(spark, sf_dir, "events"))


ORACLE_STREAM_SESSION = """
WITH marked AS (
  SELECT
    user_id,
    ts,
    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
              >= INTERVAL '30 minutes'
          OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         THEN 1 ELSE 0 END AS brk
  FROM events
),
sessions AS (
  SELECT
    user_id,
    ts,
    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM marked
)
SELECT
  epoch_us(MIN(ts)) AS session_start_us,
  user_id,
  COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, sess
"""


def with_watermark_tumbling(events: DataFrame, watermark: str = "1 hour",
                            width: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling count — the streaming-mode variant used in
    tests; in batch mode the watermark is a no-op, so the oracle for
    stream_tumble covers the arithmetic."""
    return tumbling(events.withWatermark("ts", watermark), width)


def ohlc_windowed(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Event-time OHLC rollup (streaming twin of operators/timeseries
    .ts_ohlc): open/close are min_by/max_by picks over the full
    (ts, event_id) total order — declarative aggregates, so the SAME
    expression runs as a mergeable streaming state update or a batch
    hash aggregate. Values are picks, never float accumulation."""
    win = F.window(F.col("ts"), width)
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.min_by("value", order_key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", order_key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.unix_micros(F.col("w.start").cast("timestamp")).alias(
                "window_start_us"
            ),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


def stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC per event type (batch-mode check; streaming mode
    with watermark exercised in tests/test_streaming.py)."""
    return ohlc_windowed(table(spark, sf_dir, "events"))


def with_watermark_ohlc(events: DataFrame,
                        watermark: str = "1 hour") -> DataFrame:
    return ohlc_windowed(events.withWatermark("ts", watermark))


ORACLE_STREAM_OHLC = """
SELECT
  epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS window_start_us,
  event_type,
  FIRST(value ORDER BY ts, event_id) AS open,
  MAX(value) AS high,
  MIN(value) AS low,
  LAST(value ORDER BY ts, event_id) AS close,
  COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
"""


QUERIES = {
    "stream_tumble": spec(
        stream_tumble, ORACLE_STREAM_TUMBLE, "streaming",
        doc="tumbling event-time window agg",
    ),
    "stream_slide": spec(
        stream_slide, ORACLE_STREAM_SLIDE, "streaming",
        doc="sliding event-time window agg",
    ),
    "stream_session": spec(
        stream_session, ORACLE_STREAM_SESSION, "streaming",
        doc="session windows (30 min gap) per user",
    ),
    "stream_ohlc": spec(
        stream_ohlc, ORACLE_STREAM_OHLC, "streaming",
        doc="hourly event-time OHLC (min_by/max_by streaming state)",
    ),
}
