"""Deterministic reference-shaped fixture tables (FIXTURES.md Family B).

Synthesizes ``cameras`` / ``leases`` / ``stream_acl`` DataFrames that
mirror the reference's API payload shapes (OutputSchema task.ts:48-71,
LeaseListItem task.ts:29-38, footage-token ACLs task.ts:134-141) so the
flagship pipeline can be exercised end-to-end with reference semantics:
join hits/misses, P2 filter casualties, duplicate source_ids for
last-wins, ACL-granted and -denied cameras.

Everything is seeded (seed=42 convention, TESTDATA.md); generation is
pure Python -> ``spark.createDataFrame`` with explicit schemas.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CAMERA_SCHEMA = T.StructType(
    [
        T.StructField("camera_id", T.StringType(), False),
        T.StructField("cloud_retention", T.LongType(), False),
        T.StructField("date_added", T.LongType(), False),
        T.StructField("device_retention", T.LongType(), True),
        T.StructField("firmware", T.StringType(), False),
        T.StructField("firmware_update_schedule", T.StringType(), False),
        T.StructField("last_online", T.LongType(), False),
        T.StructField("local_ip", T.StringType(), True),
        T.StructField("location", T.StringType(), False),
        T.StructField("location_angle", T.DoubleType(), False),
        T.StructField("location_lat", T.DoubleType(), False),
        T.StructField("location_lon", T.DoubleType(), False),
        T.StructField("mac", T.StringType(), True),
        T.StructField("model", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("people_history_enabled", T.BooleanType(), False),
        T.StructField("serial", T.StringType(), False),
        T.StructField("site", T.StringType(), False),
        T.StructField("site_id", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("timezone", T.StringType(), False),
        T.StructField("vehicle_history_enabled", T.BooleanType(), False),
        # synthetic arrival ordinal so "last wins" is deterministic
        T.StructField("page_idx", T.IntegerType(), False),
    ]
)

LEASE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("layer", T.LongType(), True),
        T.StructField("source_id", T.StringType(), True),
        T.StructField("ord", T.IntegerType(), False),
    ]
)

ACL_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("acl_id", T.StringType(), False),
    ]
)

N_CAMERAS = 120
N_SITES = 10
N_LEASES = 80
TARGET_LEASE_LAYER = 7


def cameras(spark: SparkSession, n: int = N_CAMERAS, seed: int = 42) -> DataFrame:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        site = i % N_SITES
        rows.append(
            (
                f"cam-{i:04d}",
                30,
                1_700_000_000 + i * 60,
                None if rng.random() < 0.05 else 90,
                "1.2.3",
                "weekly",
                1_720_000_000 + i,
                None if rng.random() < 0.05 else f"10.0.0.{i % 250}",
                f"Building {site}",
                float((i * 37) % 360),
                37.0 + (i % 100) / 1000.0,
                -122.0 - (i % 100) / 1000.0,
                None if rng.random() < 0.05 else f"00:11:22:33:44:{i % 99:02d}",
                rng.choice(["CD42", "CD52", "CB52"]),
                f"Camera {i}",
                bool(i % 2),
                f"SER{i:06d}",
                f"Site {site}",
                f"site-{site:02d}",
                rng.choice(["online", "offline"]),
                "America/Los_Angeles",
                bool(i % 3 == 0),
                i,  # page_idx: arrival ordinal
            )
        )
    return spark.createDataFrame(rows, CAMERA_SCHEMA)


def leases(spark: SparkSession, n: int = N_LEASES, seed: int = 42) -> DataFrame:
    """~60% match a camera, ~15% NULL source_id (P2 casualty), ~15% wrong
    layer (P2 casualty), >=5 duplicate source_ids (J2 last-wins)."""
    rng = random.Random(seed + 1)
    rows = []
    for i in range(n):
        r = rng.random()
        if r < 0.15:
            source = None
        elif r < 0.30:
            source = f"cam-{rng.randrange(N_CAMERAS):04d}"
        else:
            source = f"cam-{rng.randrange(N_CAMERAS):04d}"
        layer = TARGET_LEASE_LAYER if not (0.15 <= r < 0.30) else rng.choice([1, 2, 3])
        rows.append((f"lease-{i:04d}", layer, source, i))
    # guaranteed duplicates on the build key for last-wins coverage
    for j in range(5):
        rows.append((f"lease-dup-{j}", TARGET_LEASE_LAYER, f"cam-{j:04d}", n + j))
        rows.append((f"lease-dup-{j}b", TARGET_LEASE_LAYER, f"cam-{j:04d}", n + 5 + j))
    return spark.createDataFrame(rows, LEASE_SCHEMA)


def stream_acl(spark: SparkSession, seed: int = 42) -> DataFrame:
    """Grant ~50% of sites plus ~10% of individual cameras
    (task.ts:134-141 flattened to (kind, id) rows per FIXTURES.md B3)."""
    rng = random.Random(seed + 2)
    rows = [
        ("site", f"site-{s:02d}") for s in range(N_SITES) if rng.random() < 0.5
    ]
    rows += [
        ("camera", f"cam-{i:04d}")
        for i in range(N_CAMERAS)
        if rng.random() < 0.10
    ]
    return spark.createDataFrame(rows, ACL_SCHEMA)
