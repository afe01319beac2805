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
    """P1 (nested form, oracle-checked): the full Feature as one JSON doc.

    Builds the nested ``properties.sensor`` / ``geometry`` /
    ``metadata`` structure of task.ts:169-192 over the customer table,
    then serializes it with ``to_json`` — the same wire form the
    reference submits (FeatureCollection bodies are JSON, task.ts:259).
    A single string column is also what makes the nested shape portable
    to the driver's hash compare and the DuckDB oracle (struct_pack
    key order + shortest-roundtrip doubles were verified byte-identical
    between the engines; both stay in range for non-exponent rendering).
    """
    c = table(spark, sf_dir, "customer")
    lon = F.col("c_acctbal") / F.lit(100.0)
    lat = F.col("c_nationkey").cast("double")
    return c.select(
        F.col("c_custkey").cast("string").alias("id"),
        F.to_json(
            F.struct(
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
                    # lon first, task.ts:190
                    F.array(lon, lat).alias("coordinates"),
                ).alias("geometry"),
                # whole-row embed, task.ts:186
                F.struct(F.col("*")).alias("metadata"),
            )
        ).alias("feature"),
    )


ORACLE_PROJECT_STRUCT_NESTED = """
SELECT
  CAST(c_custkey AS VARCHAR) AS id,
  to_json(struct_pack(
    type := 'Feature',
    properties := struct_pack(
      type := 'b-m-p-s-p-loc',
      how := 'm-g',
      callsign := c_name,
      sensor := struct_pack(
        range := 50,
        type := 'Verkada',
        model := c_mktsegment
      )
    ),
    geometry := struct_pack(
      type := 'Point',
      coordinates := [c_acctbal / 100.0, CAST(c_nationkey AS DOUBLE)]
    ),
    metadata := struct_pack(
      c_custkey := c_custkey,
      c_name := c_name,
      c_nationkey := c_nationkey,
      c_acctbal := c_acctbal,
      c_mktsegment := c_mktsegment
    )
  )) AS feature
FROM customer
"""


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
        project_struct_nested, ORACLE_PROJECT_STRUCT_NESTED, "reference:P1",
        doc="full nested Feature struct as JSON doc, task.ts:169-192",
    ),
    "enrich_when": spec(
        enrich_when, ORACLE_ENRICH_WHEN, "reference:P5", "reference:F8",
        doc="conditional enrichment via when/otherwise, task.ts:246-249",
    ),
}
