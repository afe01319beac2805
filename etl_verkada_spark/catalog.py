"""Table loaders for the driver testdata (TESTDATA.md).

All queries go through :func:`table` so that

* runtime session defaults are always applied (the correctness driver
  passes its own SparkSession);
* the ``events`` nanosecond-timestamp quirk is handled in exactly one
  place;
* column pruning / predicate pushdown reach the parquet scan — loaders
  return plain ``spark.read.parquet`` DataFrames, never cached/collected
  copies, so Catalyst sees the full logical plan down to the file scan.

Schema-on-read validation (reference S3, ``task.ts:104-106,155-158``) is
exposed via :func:`table_validated`, which applies an expected schema with
FAILFAST semantics the way the reference's TypeBox ``.typed(schema)``
aborts the run on shape drift.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .session import ensure_session_defaults

#: Every table the driver generates (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing engine-specific quirks."""
    ensure_session_defaults(spark)
    df = spark.read.parquet(_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # Parquet TIMESTAMP(NANOS) read as long ns (nanosAsLong); the data
        # carries exactly microsecond precision so the truncation to
        # Spark's native microsecond timestamp is lossless.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the full catalog as a dict."""
    return {name: table(spark, sf_dir, name) for name in TABLES}


# ---------------------------------------------------------------------------
# Validated ingest (reference S3): explicit schema + FAILFAST, the Spark
# analogue of TypeBox `.typed(schema)` on every response page.
# ---------------------------------------------------------------------------

#: Expected schemas for strict reads. Parquet is self-describing, so the
#: FAILFAST path here is a *verification* (mismatch -> error at analysis),
#: mirroring the reference's runtime schema validation.
EXPECTED_SCHEMAS: dict[str, T.StructType] = {
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
}


def table_validated(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Strict schema-on-read: declared StructType, fail on drift.

    Reference parity: ``.typed(schema)`` + throw (task.ts:155-158); the
    v1.17.0 fix for optional/null tolerance on the last page maps to
    marking fields nullable here.
    """
    ensure_session_defaults(spark)
    df = spark.read.parquet(_path(sf_dir, name))
    expected = EXPECTED_SCHEMAS.get(name)
    if expected is not None:
        have = {f.name: f.dataType for f in df.schema.fields}
        for field in expected.fields:
            if field.name not in have:
                raise ValueError(f"{name}: missing column {field.name}")
            if have[field.name] != field.dataType:
                raise ValueError(
                    f"{name}.{field.name}: expected {field.dataType}, "
                    f"got {have[field.name]}"
                )
    return df
