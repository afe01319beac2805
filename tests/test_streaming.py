"""Structured Streaming: the same window/upsert builders running as real
streams (readStream + availableNow) must agree with their batch forms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_verkada_spark.catalog import table
from etl_verkada_spark.streaming.upsert import (
    foreach_batch_merge,
    merge_last_wins,
)
from etl_verkada_spark.streaming.windows import tumbling, with_watermark_tumbling

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Land the (ns-normalized) events table as a stream-readable dir.

    Watermarks require TIMESTAMP (LTZ); with the session pinned to UTC
    the instant values are identical to the catalog's NTZ form.
    """
    path = str(tmp_path_factory.mktemp("events_stream"))
    table(spark, SF_SMALL, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).write.mode("overwrite").parquet(path)
    return path


def _run_stream(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_streaming_tumble_equals_batch(spark, events_dir):
    batch = table(spark, SF_SMALL, "events")
    schema = spark.read.parquet(events_dir).schema  # LTZ ts for watermark
    stream = spark.readStream.schema(schema).parquet(events_dir)
    got = _run_stream(
        spark, with_watermark_tumbling(stream, "1 hour"), "t_tumble"
    )
    want = tumbling(batch)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_streaming_dedup_within_watermark(spark, events_dir):
    batch = table(spark, SF_SMALL, "events")
    schema = spark.read.parquet(events_dir).schema  # LTZ ts for watermark
    stream = spark.readStream.schema(schema).parquet(events_dir)
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .groupBy()
        .count()
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.table("t_dedup").collect()[0]["count"]
    exact = batch.select("user_id", "event_type").distinct().count()
    # all data is within one watermark here, so it's exact dedup
    assert n == exact


def test_foreach_batch_merge_converges(spark, tmp_path):
    """Two micro-batches through the S9 sink == one relational merge."""
    target = str(tmp_path / "state")
    o = table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    b1 = o.filter(F.col("o_orderkey") % 2 == 0).withColumn("v", F.lit(1))
    b2 = o.filter(F.col("o_orderkey") % 2 == 1).withColumn("v", F.lit(2))
    sink = foreach_batch_merge(target, ["o_custkey"], ["v", "o_orderkey"])
    sink(b1, 0)
    sink(b2, 1)
    got = sorted(map(tuple, spark.read.parquet(target).collect()))
    want = sorted(
        map(
            tuple,
            merge_last_wins(
                b1.unionByName(b2), b1.limit(0), ["o_custkey"], ["v", "o_orderkey"]
            ).collect(),
        )
    )
    assert got == want


def test_merge_upsert_idempotent(spark):
    """Applying the same batch twice == once (task-retry safety for S9)."""
    o = table(spark, SF_SMALL, "orders").select("o_custkey", "o_orderkey")
    once = merge_last_wins(None, o, ["o_custkey"], ["o_orderkey"])
    twice = merge_last_wins(once, o, ["o_custkey"], ["o_orderkey"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
