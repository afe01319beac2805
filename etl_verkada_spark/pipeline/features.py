"""Flagship pipeline: the reference's entire control() as ONE DataFrame query.

Reference trace (task.ts:93-286, SURVEY.md §3.4):

    leases  --filter P2--> last-wins J2 --build J1-->\\
    cameras --ACL gate P3/J3--> project Feature P1 ---> join --enrich P5--> sink

Re-expressed Spark-first:

* the lease hash map (task.ts:114-125) is a **broadcast** left join —
  the build side is filtered first (O1) and tiny, so the 100 TB camera
  side streams through with zero shuffle;
* the ACL membership gate (task.ts:209-212) is two broadcast left joins
  producing a boolean (the engine needs the flag, not just the gate,
  because the un-streamable cameras still ship as Features — only the
  video enrichment is gated);
* "last wins" (task.ts:123) is a row_number window over the explicit
  arrival ordinal (Spark preserves no arrival order — SURVEY.md §7.4);
* the Feature projection (task.ts:168-195) is a pure narrow select into
  nested structs; whole-stage codegen, no Python;
* the PATCH/POST routing of the upsert sink (task.ts:228-264) becomes an
  ``action`` column (patch/post/skip) — the actual REST sink lives in
  ``sinks/rest.py``, MERGE semantics in ``streaming/upsert.py``.

Two instantiations:

* :func:`build_features` — runs on reference-shaped tables (fixtures.py);
* ``flagship_flat`` / ``flagship_features`` — the same operator chain on
  the driver's TPC-H tables (customer->cameras, orders->leases,
  nation/region->site ACL) so the DuckDB oracle can check it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.dedup import last_wins
from ..registry import spec

VIDEO_URL_PREFIX = "https://stream.example/hls/"
SENSOR_RANGE = 50  # meters, task.ts:178


# ---------------------------------------------------------------------------
# Generic pipeline over reference-shaped inputs
# ---------------------------------------------------------------------------

def prepare_leases(leases: DataFrame, layer_id: int) -> DataFrame:
    """P2 filter + J2 last-wins: the join build side (task.ts:116-127).

    Only ``id`` survives per key, so the argmax carries ONE column —
    ``max_by(id, ord)`` — not the generic whole-row struct of
    :func:`~..operators.dedup.last_wins`. Map-side combine still
    applies; per-row payload drops from 4 fields to 1 (measured ~40%
    off the aggregate stage at sf0.1, and at 100 TB that is the
    shuffle-byte budget of the build side). ``ord`` must be unique per
    key (o_orderkey / arrival ordinal is) for a deterministic winner.
    """
    filtered = leases.filter(
        (F.col("layer") == F.lit(layer_id)) & F.col("source_id").isNotNull()
    )
    return filtered.groupBy("source_id").agg(
        F.max_by("id", "ord").alias("lease_id")
    )


def acl_flag(cameras: DataFrame, stream_acl: DataFrame) -> DataFrame:
    """P3/J3: streamable = site granted OR camera granted.

    Implemented as two broadcast left joins against the (tiny) ACL table
    rather than collected isin lists, so the same plan works when the ACL
    is itself large. Both joins carry ``kind`` in the equi-key and probe
    the SAME deduped subtree, so the physical plan builds ONE broadcast
    (ReusedExchange for the second join) — one dedup shuffle + one build
    job instead of two of each.
    """
    acl = stream_acl.select("kind", "acl_id").distinct()
    a_site, a_cam = acl.alias("__acl_site"), acl.alias("__acl_cam")
    out = cameras.join(
        F.broadcast(a_site),
        (F.col("__acl_site.kind") == F.lit("site"))
        & (cameras["site_id"] == F.col("__acl_site.acl_id")),
        "left",
    ).select(*cameras.columns, F.col("__acl_site.acl_id").alias("site_acl"))
    out = out.join(
        F.broadcast(a_cam),
        (F.col("__acl_cam.kind") == F.lit("camera"))
        & (out["camera_id"] == F.col("__acl_cam.acl_id")),
        "left",
    ).select(*out.columns, F.col("__acl_cam.acl_id").alias("cam_acl"))
    return out.withColumn(
        "streamable",
        F.col("site_acl").isNotNull() | F.col("cam_acl").isNotNull(),
    ).drop("site_acl", "cam_acl")


def build_features(
    cameras: DataFrame,
    leases: DataFrame,
    stream_acl: DataFrame,
    layer_id: int,
) -> DataFrame:
    """The whole reference control() as one declarative plan."""
    cams = last_wins(cameras, ["camera_id"], ["page_idx"])  # dedup across pages
    build = prepare_leases(leases, layer_id)
    gated = acl_flag(cams, stream_acl)
    joined = gated.join(
        F.broadcast(build), gated["camera_id"] == build["source_id"], "left"
    )
    camera_cols = [c for c in cameras.columns if c != "page_idx"]
    video = F.when(
        F.col("streamable"),
        F.struct(
            F.concat(F.lit(VIDEO_URL_PREFIX), F.col("camera_id")).alias("url")
        ),
    )
    return joined.select(
        F.col("camera_id").alias("id"),
        F.lit("Feature").alias("type"),
        F.struct(
            F.lit("b-m-p-s-p-loc").alias("type"),  # task.ts:173
            F.lit("m-g").alias("how"),  # task.ts:174
            F.col("name").alias("callsign"),  # task.ts:175
            F.col("location_angle").alias("course"),  # task.ts:176
            F.struct(
                F.lit(SENSOR_RANGE).alias("range"),
                F.col("location_angle").alias("azimuth"),
                F.lit("Verkada").alias("type"),
                F.col("model").alias("model"),
            ).alias("sensor"),  # task.ts:177-182
            F.concat_ws(",", F.col("site"), F.col("status")).alias("remarks"),
            video.alias("video"),  # task.ts:246-249
        ).alias("properties"),
        F.struct(
            F.lit("Point").alias("type"),
            F.array(F.col("location_lon"), F.col("location_lat")).alias(
                "coordinates"
            ),  # lon first, task.ts:188-191
        ).alias("geometry"),
        F.struct(*[F.col(c) for c in camera_cols]).alias("metadata"),
        # upsert routing (task.ts:228-264): patch if lease exists else post
        F.when(~F.col("streamable"), F.lit("skip"))
        .when(F.col("lease_id").isNotNull(), F.lit("patch"))
        .otherwise(F.lit("post"))
        .alias("action"),
    )


def to_feature_collection(features: DataFrame):
    """S8: FeatureCollection assembly (task.ts:280-283) — JSON lines of
    Features; the single-document wrapper exists only at the sink edge
    (foreachBatch / collectless write), never as a driver materialization.
    """
    return features.select(F.to_json(F.struct("*")).alias("feature_json"))


# ---------------------------------------------------------------------------
# TPC-H instantiation (oracle-checkable): customer->cameras, orders->leases,
# nation/region->site ACL, custkey%7->camera ACL.
# ---------------------------------------------------------------------------

def _tpch_cameras(spark, sf_dir) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").cast("string").alias("camera_id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").cast("string").alias("site_id"),
        (F.col("c_custkey") % 360).cast("double").alias("location_angle"),
        F.col("c_nationkey").cast("double").alias("location_lat"),
        (F.col("c_acctbal") / F.lit(100.0)).alias("location_lon"),
        F.col("c_mktsegment").alias("model"),
    )


def _tpch_leases(spark, sf_dir) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").cast("string").alias("id"),
        F.when(F.col("o_orderstatus").isin("O", "P"), F.lit(1))
        .otherwise(F.lit(2))
        .cast("long")
        .alias("layer"),
        F.when(
            F.col("o_totalprice") >= F.lit(1000.0),
            F.col("o_custkey").cast("string"),
        ).alias("source_id"),
        F.col("o_orderkey").alias("ord"),
    )


def _tpch_acl(spark, sf_dir) -> tuple[DataFrame, DataFrame]:
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    c = table(spark, sf_dir, "customer")
    # One (kind, acl_id) table, the generic acl_flag shape. No
    # .distinct(): n_nationkey stays unique through the 1:1 region join
    # and c_custkey is the customer key — a distinct would only add a
    # shuffle before the broadcast build.
    sites = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name").isin("AMERICA", "ASIA"))
        .select(
            F.lit("site").alias("kind"),
            F.col("n_nationkey").cast("string").alias("acl_id"),
        )
    )
    cams = (
        c.filter(F.col("c_custkey") % 7 == 0)
        .select(
            F.lit("camera").alias("kind"),
            F.col("c_custkey").cast("string").alias("acl_id"),
        )
    )
    return sites.unionByName(cams)


def flagship_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship chain, flat output, DuckDB-oracle-checked.

    Exercises S3, P1-P3, J1-J4, J2/W1, A-series routing in one plan:
    scan -> filter -> last-wins window -> broadcast left join -> two
    broadcast ACL joins -> projection -> conditional enrichment.
    """
    cams = _tpch_cameras(spark, sf_dir)
    # Same build side prepare_leases(_tpch_leases(...), 1) computes, but
    # staged so the narrow work happens in the right order for a scan
    # that feeds an aggregate: plain-column predicates FIRST (layer==1
    # unfolds to o_orderstatus IN ('O','P'), source_id IS NOT NULL to
    # o_totalprice >= 1000 — both reach the parquet scan as
    # PushedFilters, which the CASE-derived forms do not), argmax over
    # LONG keys, and the id -> string casts on the ~N_custkey winners
    # after the aggregate instead of every scanned row (measured ~0.4s
    # -> ~0.25s at sf0.1; at 100 TB it is the difference between
    # casting the corpus and casting the dictionary).
    o = table(spark, sf_dir, "orders")
    build = (
        o.filter(
            F.col("o_orderstatus").isin("O", "P")  # layer == 1
            & (F.col("o_totalprice") >= F.lit(1000.0))  # source_id not null
        )
        .groupBy("o_custkey")
        .agg(F.max_by("o_orderkey", "o_orderkey").alias("lease_key"))
        .select(
            F.col("o_custkey").cast("string").alias("source_id"),
            F.col("lease_key").cast("string").alias("lease_id"),
        )
    )
    acl = _tpch_acl(spark, sf_dir)
    # Site ACL: a genuine dim join — 25 nations gated by region, always
    # broadcastable. kind is part of the equi-key, so Catalyst pushes
    # the 'site' literal through the union and prunes the camera branch
    # from this build.
    a_site = acl.alias("__acl_site")
    gated = cams.join(
        F.broadcast(a_site),
        (F.col("__acl_site.kind") == F.lit("site"))
        & (cams["site_id"] == F.col("__acl_site.acl_id")),
        "left",
    ).select(*cams.columns, F.col("__acl_site.acl_id").alias("site_acl"))
    # Camera ACL: the list is derived from the SAME customer table on
    # the SAME unique key (custkey % 7 == 0), so the self-join is a
    # row-local predicate. Inlining it deletes a broadcast build job and
    # a second full customer scan — and at 100 TB it is a correctness-
    # of-scale fix, not just a constant: 1/7 of all cameras stops being
    # broadcastable long before the 25-row site dim does.
    gated = gated.withColumn(
        "cam_acl",
        F.when(
            F.col("camera_id").cast("long") % 7 == 0, F.col("camera_id")
        ),
    )
    joined = gated.join(
        F.broadcast(build), gated["camera_id"] == build["source_id"], "left"
    )
    streamable = F.col("site_acl").isNotNull() | F.col("cam_acl").isNotNull()
    return joined.select(
        F.col("camera_id").alias("id"),
        F.lit("Feature").alias("type"),
        F.col("name").alias("callsign"),
        F.col("location_angle").alias("course"),
        F.col("location_lon").alias("lon"),
        F.col("location_lat").alias("lat"),
        F.col("source_id").isNotNull().alias("has_lease"),
        # the id the PATCH path targets (task.ts:228-243); also what keeps
        # the J2 argmax in the plan (pruned to DISTINCT if unused)
        F.col("lease_id"),
        streamable.alias("streamable"),
        F.when(
            streamable, F.concat(F.lit(VIDEO_URL_PREFIX), F.col("camera_id"))
        ).alias("video_url"),
        F.when(~streamable, F.lit("skip"))
        .when(F.col("source_id").isNotNull(), F.lit("patch"))
        .otherwise(F.lit("post"))
        .alias("action"),
    )


ORACLE_FLAGSHIP_FLAT = """
WITH leases AS (
  SELECT
    CAST(o_orderkey AS VARCHAR) AS lease_id,
    CASE WHEN o_orderstatus IN ('O','P') THEN 1 ELSE 2 END AS layer,
    CASE WHEN o_totalprice >= 1000.0 THEN CAST(o_custkey AS VARCHAR) END AS source_id,
    o_orderkey AS ord
  FROM orders
),
lease_lw AS (
  SELECT lease_id, source_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY source_id ORDER BY ord DESC) AS rn
    FROM leases
    WHERE layer = 1 AND source_id IS NOT NULL
  ) WHERE rn = 1
),
acl_sites AS (
  SELECT DISTINCT CAST(n_nationkey AS VARCHAR) AS site_acl
  FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name IN ('AMERICA','ASIA')
),
acl_cams AS (
  SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS cam_acl
  FROM customer WHERE c_custkey % 7 = 0
),
cams AS (
  SELECT
    CAST(c_custkey AS VARCHAR) AS camera_id,
    c_name AS name,
    CAST(c_nationkey AS VARCHAR) AS site_id,
    CAST(c_custkey % 360 AS DOUBLE) AS location_angle,
    CAST(c_nationkey AS DOUBLE) AS location_lat,
    c_acctbal / 100.0 AS location_lon
  FROM customer
)
SELECT
  cams.camera_id AS id,
  'Feature' AS type,
  cams.name AS callsign,
  cams.location_angle AS course,
  cams.location_lon AS lon,
  cams.location_lat AS lat,
  l.source_id IS NOT NULL AS has_lease,
  l.lease_id,
  (s.site_acl IS NOT NULL OR a.cam_acl IS NOT NULL) AS streamable,
  CASE WHEN s.site_acl IS NOT NULL OR a.cam_acl IS NOT NULL
       THEN 'https://stream.example/hls/' || cams.camera_id END AS video_url,
  CASE WHEN s.site_acl IS NULL AND a.cam_acl IS NULL THEN 'skip'
       WHEN l.source_id IS NOT NULL THEN 'patch'
       ELSE 'post' END AS action
FROM cams
LEFT JOIN acl_sites s ON cams.site_id = s.site_acl
LEFT JOIN acl_cams a ON cams.camera_id = a.cam_acl
LEFT JOIN lease_lw l ON cams.camera_id = l.source_id
"""


def flagship_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full nested Feature output over the TPC-H derivation, serialized.

    The nested Feature (task.ts:169-192) is built by :func:`build_features`
    unchanged; the driver surface serializes it to ONE JSON string column
    via ``to_json`` — raw struct columns arrive in the driver's pandas
    canonicalizer as unhashable dict cells (the r4 `TypeError: unhashable
    type: 'dict'` crash), while a string column both hashes and matches
    the DuckDB ``to_json(struct_pack(...))`` oracle byte-for-byte.
    ``ignoreNullFields=false`` makes Spark render the un-streamable rows'
    ``"video":null`` exactly as DuckDB renders a NULL struct (probed:
    both engines emit identical bytes for null structs and shortest-
    roundtrip doubles; same verification as project_struct_nested r2).
    """
    cams = _tpch_cameras(spark, sf_dir).select(
        "*",
        F.lit(0).alias("page_idx"),
        F.lit("Site").alias("site"),
        F.lit("online").alias("status"),
    )
    leases = _tpch_leases(spark, sf_dir)
    acl = _tpch_acl(spark, sf_dir)
    feats = build_features(cams, leases, acl, layer_id=1)
    return feats.select(
        F.col("id"),
        F.col("action"),
        F.to_json(
            F.struct(
                F.col("type"),
                F.col("properties"),
                F.col("geometry"),
                F.col("metadata"),
            ),
            {"ignoreNullFields": "false"},
        ).alias("feature"),
    )


ORACLE_FLAGSHIP_FEATURES = """
WITH lease_lw AS (
  SELECT
    CAST(o_custkey AS VARCHAR) AS source_id,
    CAST(MAX(o_orderkey) AS VARCHAR) AS lease_id
  FROM orders
  WHERE o_orderstatus IN ('O','P') AND o_totalprice >= 1000.0
  GROUP BY o_custkey
),
acl_sites AS (
  SELECT DISTINCT CAST(n_nationkey AS VARCHAR) AS site_acl
  FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name IN ('AMERICA','ASIA')
),
acl_cams AS (
  SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS cam_acl
  FROM customer WHERE c_custkey % 7 = 0
),
cams AS (
  SELECT
    CAST(c_custkey AS VARCHAR) AS camera_id,
    c_name AS name,
    CAST(c_nationkey AS VARCHAR) AS site_id,
    CAST(c_custkey % 360 AS DOUBLE) AS location_angle,
    CAST(c_nationkey AS DOUBLE) AS location_lat,
    c_acctbal / 100.0 AS location_lon,
    c_mktsegment AS model
  FROM customer
)
SELECT
  cams.camera_id AS id,
  CASE WHEN s.site_acl IS NULL AND a.cam_acl IS NULL THEN 'skip'
       WHEN l.lease_id IS NOT NULL THEN 'patch'
       ELSE 'post' END AS action,
  to_json(struct_pack(
    type := 'Feature',
    properties := struct_pack(
      type := 'b-m-p-s-p-loc',
      how := 'm-g',
      callsign := cams.name,
      course := cams.location_angle,
      sensor := struct_pack(
        range := 50,
        azimuth := cams.location_angle,
        type := 'Verkada',
        model := cams.model
      ),
      remarks := 'Site,online',
      video := CASE WHEN s.site_acl IS NOT NULL OR a.cam_acl IS NOT NULL
                    THEN struct_pack(
                      url := 'https://stream.example/hls/' || cams.camera_id
                    ) END
    ),
    geometry := struct_pack(
      type := 'Point',
      coordinates := [cams.location_lon, cams.location_lat]
    ),
    metadata := struct_pack(
      camera_id := cams.camera_id,
      name := cams.name,
      site_id := cams.site_id,
      location_angle := cams.location_angle,
      location_lat := cams.location_lat,
      location_lon := cams.location_lon,
      model := cams.model,
      site := 'Site',
      status := 'online'
    )
  )) AS feature
FROM cams
LEFT JOIN acl_sites s ON cams.site_id = s.site_acl
LEFT JOIN acl_cams a ON cams.camera_id = a.cam_acl
LEFT JOIN lease_lw l ON cams.camera_id = l.source_id
"""


QUERIES = {
    "flagship_flat": spec(
        flagship_flat, ORACLE_FLAGSHIP_FLAT,
        "reference:P1", "reference:P2", "reference:P3", "reference:J1",
        "reference:J2", "reference:J3", "reference:S9",
        doc="whole reference control() as one plan (flat, oracle-checked)",
    ),
    "flagship_features": spec(
        flagship_features, ORACLE_FLAGSHIP_FEATURES,
        "reference:P1", "reference:S8",
        doc="full nested GeoJSON Feature as JSON doc (oracle-checked)",
    ),
}
