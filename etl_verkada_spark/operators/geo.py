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


GEO_KNN_RADIUS_DEG = 5  # search radius == cell size: 3x3 block suffices
_CELL_E4 = GEO_KNN_RADIUS_DEG * 10_000
_R2_E4 = _CELL_E4 * _CELL_E4
_LON_SHIFT_CELLS = 200  # same negative-floor shift as geo_density


def geo_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest site (supplier) within GEO_KNN_RADIUS_DEG of each camera
    (customer) — the radius-bounded nearest-neighbor join behind
    "attach every camera to its closest gateway".

    Grid blocking with cell size == radius makes the 3x3 neighborhood a
    PROOF, not a heuristic: euclidean distance <= R bounds each axis
    delta by R, i.e. by one cell. The small side (sites) is exploded x9
    into its neighbor cells and broadcast; the probe side joins on its
    own cell id — the big side never fans out, never shuffles (the
    join_range_banded trick in two dimensions). The winner per camera
    is one mergeable min(struct(d2, site)) aggregate.

    All coordinates are e-4-degree integers (the geo_density scaling),
    so distances are exact BIGINTs and the (d2, suppkey) tie-break is
    total — the oracle brute-forces all pairs and must agree
    bit-for-bit. Cameras with no site in radius drop (inner semantics).
    """
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    shift = _LON_SHIFT_CELLS * _CELL_E4

    def _pts(df: DataFrame, key: str, nat: str, bal: str) -> DataFrame:
        return df.select(
            F.col(key).alias(f"{key}"),
            (F.col(nat).cast("long") * 10_000).alias("lat_e4"),
            scaled_long(F.col(bal)).alias("lon_e4"),
        ).select(
            key,
            "lat_e4",
            "lon_e4",
            F.expr(f"(lon_e4 + {shift}) div {_CELL_E4}").alias("cx"),
            F.expr(f"(lat_e4 + {shift}) div {_CELL_E4}").alias("cy"),
        )

    cams = _pts(c, "c_custkey", "c_nationkey", "c_acctbal")
    sites = (
        _pts(s, "s_suppkey", "s_nationkey", "s_acctbal")
        .select(
            F.col("s_suppkey"),
            F.col("lat_e4").alias("s_lat"),
            F.col("lon_e4").alias("s_lon"),
            "cx",
            "cy",
            F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dx"),
        )
        .select(
            "s_suppkey",
            "s_lat",
            "s_lon",
            (F.col("cx") + F.col("dx")).alias("scx"),
            "cy",
            F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dy"),
        )
        .select(
            "s_suppkey",
            "s_lat",
            "s_lon",
            "scx",
            (F.col("cy") + F.col("dy")).alias("scy"),
        )
    )
    d2 = (
        (F.col("lat_e4") - F.col("s_lat")) * (F.col("lat_e4") - F.col("s_lat"))
        + (F.col("lon_e4") - F.col("s_lon"))
        * (F.col("lon_e4") - F.col("s_lon"))
    )
    cand = (
        cams.join(
            F.broadcast(sites),
            (F.col("cx") == F.col("scx")) & (F.col("cy") == F.col("scy")),
        )
        .select("c_custkey", "s_suppkey", d2.alias("d2"))
        .filter(F.col("d2") <= _R2_E4)
    )
    best = cand.groupBy("c_custkey").agg(
        F.min(F.struct("d2", "s_suppkey")).alias("b")
    )
    return best.select(
        "c_custkey",
        F.col("b.s_suppkey").alias("s_suppkey"),
        F.col("b.d2").alias("d2_e8"),
    )


ORACLE_GEO_KNN = f"""
WITH cams AS (
  SELECT c_custkey,
    CAST(c_nationkey AS BIGINT) * 10000 AS lat_e4,
    CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS lon_e4
  FROM customer
),
sites AS (
  SELECT s_suppkey,
    CAST(s_nationkey AS BIGINT) * 10000 AS lat_e4,
    CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT) AS lon_e4
  FROM supplier
),
pairs AS (
  SELECT c.c_custkey, s.s_suppkey,
    (c.lat_e4 - s.lat_e4) * (c.lat_e4 - s.lat_e4)
      + (c.lon_e4 - s.lon_e4) * (c.lon_e4 - s.lon_e4) AS d2
  FROM cams c CROSS JOIN sites s
),
best AS (
  SELECT c_custkey, MIN({{'d2': d2, 's': s_suppkey}}) AS b
  FROM pairs
  WHERE d2 <= {_R2_E4}
  GROUP BY c_custkey
)
SELECT c_custkey, b.s AS s_suppkey, b.d2 AS d2_e8 FROM best
"""


QUERIES = {
    "geo_density": spec(
        geo_density, ORACLE_GEO_DENSITY, "beyond",
        doc="5-degree grid density of cameras (integer-exact cell ids)",
    ),
    "geo_knn": spec(
        geo_knn, ORACLE_GEO_KNN, "beyond",
        doc="radius-bounded nearest-site join via 3x3 grid blocking",
    ),
}
