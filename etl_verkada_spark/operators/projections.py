"""Projections into nested structs + conditional enrichment.

Reference P1/P5 (SURVEY.md §2.2): the camera -> GeoJSON Feature reshape
(task.ts:168-195) — renames, literal constants, nested ``sensor`` /
``geometry`` structs, a ``[lon, lat]`` coordinate array and a whole-row
``metadata`` embed — and the conditional ``properties.video`` enrichment
(task.ts:246-249).

Projections are pure narrow transforms: no shuffle, fully pipelined in
whole-stage codegen, and column pruning means the scan reads only the
referenced columns even though ``metadata`` embeds "the whole row" (the
struct lists its fields explicitly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import spec


def project_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 (flat form, oracle-checked): rename + literals + computed cols.

    Mirrors the Feature projection's scalar surface: ``camera_id -> id``,
    ``name -> callsign``, constants ``type/how/sensor.range/sensor.type``
    (task.ts:170-182), coordinates lon-first (task.ts:188-191).
    """
    c = table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").cast("string").alias("id"),
        F.lit("Feature").alias("type"),
        F.lit("b-m-p-s-p-loc").alias("cot_type"),
        F.lit("m-g").alias("how"),
        F.col("c_name").alias("callsign"),
        F.lit(50).alias("sensor_range"),
        F.lit("Verkada").alias("sensor_type"),
        F.col("c_mktsegment").alias("sensor_model"),
        (F.col("c_acctbal") / F.lit(100.0)).alias("lon"),
        F.col("c_nationkey").cast("double").alias("lat"),
    )


ORACLE_PROJECT_STRUCT = """
SELECT
  CAST(c_custkey AS VARCHAR)  AS id,
  'Feature'                   AS type,
  'b-m-p-s-p-loc'             AS cot_type,
  'm-g'                       AS how,
  c_name                      AS callsign,
  50                          AS sensor_range,
  'Verkada'                   AS sensor_type,
  c_mktsegment                AS sensor_model,
  c_acctbal / 100.0           AS lon,
  CAST(c_nationkey AS DOUBLE) AS lat
FROM customer
"""


def project_struct_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 (nested form, rows-only): the full Feature shape.

    Builds the nested ``properties.sensor`` / ``geometry`` /
    ``metadata`` structure of task.ts:169-192 over the customer table.
    Registered rows-only because nested-struct hashing is not portable to
    the SQL oracle; the flat scalar surface is checked by
    ``project_struct`` and the full pipeline by ``flagship_*``.
    """
    c = table(spark, sf_dir, "customer")
    lon = F.col("c_acctbal") / F.lit(100.0)
    lat = F.col("c_nationkey").cast("double")
    return c.select(
        F.col("c_custkey").cast("string").alias("id"),
        F.lit("Feature").alias("type"),
        F.struct(
            F.lit("b-m-p-s-p-loc").alias("type"),
            F.lit("m-g").alias("how"),
            F.col("c_name").alias("callsign"),
            F.struct(
                F.lit(50).alias("range"),
                F.lit("Verkada").alias("type"),
                F.col("c_mktsegment").alias("model"),
            ).alias("sensor"),
        ).alias("properties"),
        F.struct(
            F.lit("Point").alias("type"),
            F.array(lon, lat).alias("coordinates"),  # lon first, task.ts:190
        ).alias("geometry"),
        F.struct(F.col("*")).alias("metadata"),  # whole-row embed, task.ts:186
    )


def enrich_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: conditional enrichment — add a value only when a guard holds.

    Reference: ``feature.properties.video = {url}`` only when the lease
    round-trip returned an HLS url (task.ts:246-249). `when/otherwise`
    keeps the branch inside codegen; the string assembly is F1/F8.
    """
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderstatus") == F.lit("O"),
            F.concat(F.lit("https://stream.example/hls/"), F.col("o_orderkey")),
        ).alias("video_url"),
    )


ORACLE_ENRICH_WHEN = """
SELECT
  o_orderkey,
  o_orderstatus,
  CASE WHEN o_orderstatus = 'O'
       THEN 'https://stream.example/hls/' || CAST(o_orderkey AS VARCHAR)
  END AS video_url
FROM orders
"""


QUERIES = {
    "project_struct": spec(
        project_struct, ORACLE_PROJECT_STRUCT, "reference:P1",
        doc="rename/literal/computed projection (flat), task.ts:168-195",
    ),
    "project_struct_nested": spec(
        project_struct_nested, None, "reference:P1",
        doc="full nested Feature struct (rows-only), task.ts:169-192",
    ),
    "enrich_when": spec(
        enrich_when, ORACLE_ENRICH_WHEN, "reference:P5", "reference:F8",
        doc="conditional enrichment via when/otherwise, task.ts:246-249",
    ),
}
