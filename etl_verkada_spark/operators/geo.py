"""Geospatial binning over the feature surface (SURVEY.md §2 P1/S8
adjacent — the reference's domain is GeoJSON/CoT features with
lat/lon/course, task.ts:190-226; this is the density rollup a map tile
layer runs over those features).

Grid binning IS the scalable spatial strategy on Spark: a geohash-like
integer cell id turns proximity queries into equi-joins/group-bys
(the same banding trick as join_range_banded, in two dimensions). No
geometry library needed for rectangular cells — and the cell id is
pure integer arithmetic, so the oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import spec
from .aggregates import scaled_long, unscale

GEO_CELL_DEG = 5  # 5-degree cells


def geo_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Camera density per 5-degree grid cell.

    Reuses the flagship's camera projection (customer -> camera with
    location_lat = nationkey, location_lon = acctbal/100, both exact in
    cents). Cell ids floor-divide the CENTS form, so boundary
    coordinates land deterministically (float floor(lon/5) puts
    -0.004999... in the wrong cell when the double dips a hair under
    the edge). One mergeable aggregate; output is grid-sized.
    """
    c = table(spark, sf_dir, "customer")
    cams = c.select(
        F.col("c_nationkey").cast("long").alias("lat_c"),
        scaled_long("c_acctbal").alias("lon_c"),  # acctbal/100 deg, in e-4 deg
        (F.col("c_acctbal") / F.lit(100.0)).alias("lon"),
    )
    # lon cents: acctbal is <=2-decimal dollars; lon = acctbal/100 =>
    # 4-decimal degrees; scaled_long(acctbal) is already lon * 1e4.
    # acctbal can be NEGATIVE, and integer division of negatives is
    # engine-divergent (Spark `div` truncates toward zero, floor
    # semantics differ) — so shift into positive range, divide, shift
    # the CELL id back: floor == truncate on positives in both engines.
    cell_deg_e4 = GEO_CELL_DEG * 10_000
    lon_shift_cells = 200  # covers lon >= -1000 deg, far below min acctbal
    binned = cams.select(
        F.col("lat_c").alias("lat"),  # integer degrees already
        (
            F.expr(
                f"(lon_c + {lon_shift_cells * cell_deg_e4})"
                f" div {cell_deg_e4}"
            )
            - F.lit(lon_shift_cells)
        ).alias("cell_x"),
        F.expr(f"lat_c div {GEO_CELL_DEG}").alias("cell_y"),
        "lon",
    )
    return (
        binned.groupBy("cell_x", "cell_y")
        .agg(
            F.count(F.lit(1)).alias("n_cameras"),
            F.min("lat").alias("min_lat"),
            F.max("lat").alias("max_lat"),
            unscale(F.sum(scaled_long(F.col("lon"), 4)), 4).alias(
                "sum_lon"
            ),
        )
    )


ORACLE_GEO_DENSITY = """
WITH cams AS (
  SELECT
    CAST(c_nationkey AS BIGINT) AS lat,
    CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS lon_c,
    c_acctbal / 100.0 AS lon
  FROM customer
),
binned AS (
  SELECT
    lat,
    (lon_c + 10000000) // 50000 - 200 AS cell_x,
    lat // 5 AS cell_y,
    lon
  FROM cams
)
SELECT
  cell_x,
  cell_y,
  COUNT(*) AS n_cameras,
  MIN(lat) AS min_lat,
  MAX(lat) AS max_lat,
  CAST(CAST(SUM(CAST(FLOOR(lon * 10000 + 0.5) AS BIGINT)) AS DECIMAL(38,0))
       / 10000 AS DOUBLE) AS sum_lon
FROM binned
GROUP BY cell_x, cell_y
"""


QUERIES = {
    "geo_density": spec(
        geo_density, ORACLE_GEO_DENSITY, "beyond",
        doc="5-degree grid density of cameras (integer-exact cell ids)",
    ),
}
