"""Streaming deduplication (SURVEY.md §2.9 + the LLM-pipeline dedup
family's streaming form).

``dropDuplicatesWithinWatermark`` is the stream-native exact dedup: the
first row per key is emitted, later copies are dropped, and — unlike
plain ``dropDuplicates`` on a stream — state for a key is EVICTED once
the watermark passes it, so state size tracks the dedup horizon instead
of the whole history. That bounded-state property is the 100 TB
requirement: an unbounded-state stream dedup eventually OOMs or spills
its state store; a watermarked one holds only the active window (with
RocksDB state store off-heap at production scale, SCALE.md §6).

The registered query is a REAL streaming run (readStream -> dedup ->
append memory sink, availableNow) checked against a batch DISTINCT
oracle: the sf events table is one file -> one micro-batch, so no row
is ever beyond the watermark and streaming dedup == exact DISTINCT.
Multi-batch eviction behavior is exercised in tests/test_streaming.py.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from ..registry import spec
from .stateful import events_stream

DEDUP_WATERMARK = "1 hour"


def dedup_within_watermark(
    events: DataFrame, keys: list[str], watermark: str = DEDUP_WATERMARK
) -> DataFrame:
    """First-wins key dedup with watermark-bounded state.

    The event-time column must be carried for the watermark; only the
    key columns are output so the result is a deterministic SET (which
    physical row "wins" per key depends on arrival order — exactly the
    nondeterminism the reference's last-wins map resolves with an
    explicit ordinal in the batch operators)."""
    from pyspark.sql import functions as F

    return (
        # watermarks require TIMESTAMP (ntz is rejected); the column is
        # only consumed by the watermark and dropped from the output, so
        # the session-zone reinterpretation cannot affect results
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select(*keys, "ts")
        .dropDuplicatesWithinWatermark(keys)
        .select(*keys)
    )


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real streaming run: distinct (user_id, event_type) pairs."""
    dd = dedup_within_watermark(
        events_stream(spark, sf_dir), ["user_id", "event_type"]
    )
    qname = f"dedup_{uuid.uuid4().hex[:12]}"
    q = (
        dd.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


ORACLE_STREAM_DEDUP = """
SELECT DISTINCT user_id, event_type FROM events
"""


QUERIES = {
    "stream_dedup": spec(
        stream_dedup, ORACLE_STREAM_DEDUP, "streaming", "llm",
        doc="watermark-bounded streaming exact dedup (real run)",
    ),
}
