"""Flagship pipeline on reference-shaped fixtures (FIXTURES.md B1-B4):
the invariants of task.ts reproduced end-to-end."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from etl_verkada_spark import fixtures
from etl_verkada_spark.pipeline.features import (
    build_features,
    prepare_leases,
    to_feature_collection,
)


def _inputs(spark):
    return (
        fixtures.cameras(spark),
        fixtures.leases(spark),
        fixtures.stream_acl(spark),
    )


def test_feature_invariants(spark):
    cams, leases, acl = _inputs(spark)
    out = build_features(cams, leases, acl, fixtures.TARGET_LEASE_LAYER).cache()

    # B4 invariant: one output row per distinct camera_id (dedup)
    assert out.count() == cams.select("camera_id").distinct().count()

    rows = {r["id"]: r for r in out.collect()}
    acl_rows = acl.collect()
    granted_sites = {r["acl_id"] for r in acl_rows if r["kind"] == "site"}
    granted_cams = {r["acl_id"] for r in acl_rows if r["kind"] == "camera"}

    for cam in cams.collect():
        feat = rows[cam["camera_id"]]
        props, geo, meta = feat["properties"], feat["geometry"], feat["metadata"]
        streamable = (
            cam["site_id"] in granted_sites or cam["camera_id"] in granted_cams
        )
        # video non-null <=> passes the ACL gate (task.ts:209-212,245-249)
        assert (props["video"] is not None) == streamable
        if streamable:
            assert props["video"]["url"].endswith(cam["camera_id"])
        # geometry: Point, lon FIRST (task.ts:188-191)
        assert geo["type"] == "Point"
        assert geo["coordinates"] == [cam["location_lon"], cam["location_lat"]]
        # constants (task.ts:171-182)
        assert feat["type"] == "Feature"
        assert props["type"] == "b-m-p-s-p-loc"
        assert props["how"] == "m-g"
        assert props["sensor"]["range"] == 50
        assert props["sensor"]["type"] == "Verkada"
        # metadata embeds the full camera record (task.ts:186)
        assert meta["serial"] == cam["serial"]
        assert len(meta.asDict()) == 22

    out.unpersist()


def test_action_routing(spark):
    """PATCH iff a surviving lease matches, POST otherwise, skip when the
    ACL gate fails (task.ts:228-264 + the else-skip)."""
    cams, leases, acl = _inputs(spark)
    out = build_features(cams, leases, acl, fixtures.TARGET_LEASE_LAYER)
    build = {
        r["source_id"]
        for r in prepare_leases(leases, fixtures.TARGET_LEASE_LAYER).collect()
    }
    acl_rows = acl.collect()
    granted_sites = {r["acl_id"] for r in acl_rows if r["kind"] == "site"}
    granted_cams = {r["acl_id"] for r in acl_rows if r["kind"] == "camera"}
    for r in out.collect():
        cam_id, site_id = r["id"], r["metadata"]["site_id"]
        streamable = site_id in granted_sites or cam_id in granted_cams
        expected = (
            "skip" if not streamable else ("patch" if cam_id in build else "post")
        )
        assert r["action"] == expected, (cam_id, r["action"], expected)


def test_lease_last_wins(spark):
    """Duplicate source_ids: the highest ord (latest arrival) survives —
    the v1.17.0 duplicate-lease fix (CHANGELOG.md:16, task.ts:123)."""
    _, leases, _ = _inputs(spark)
    surviving = {
        r["source_id"]: r["lease_id"]
        for r in prepare_leases(leases, fixtures.TARGET_LEASE_LAYER).collect()
    }
    raw = leases.filter(
        (F.col("layer") == fixtures.TARGET_LEASE_LAYER)
        & F.col("source_id").isNotNull()
    ).collect()
    last_by_source = {}
    for r in sorted(raw, key=lambda r: r["ord"]):
        last_by_source[r["source_id"]] = r["id"]
    assert surviving == last_by_source


def test_feature_collection_is_json(spark):
    cams, leases, acl = _inputs(spark)
    out = build_features(cams, leases, acl, fixtures.TARGET_LEASE_LAYER)
    lines = to_feature_collection(out).limit(5).collect()
    for line in lines:
        doc = json.loads(line["feature_json"])
        assert doc["type"] == "Feature"
        assert set(doc) >= {"id", "properties", "geometry", "metadata"}


def test_flagship_plan_shape(spark):
    """The 100 TB contract of the flagship plan (VERDICT r1 item 4):

    * exactly one scan of customer, period (round 4: the camera ACL —
      same table, same unique key — is a row-local predicate, not a
      self-join; only the site dim and the lease argmax remain as
      broadcast builds);
    * every dimension side is a broadcast build — no shuffle of the
      probe side at all (the only Exchange is the lease argmax's);
    * the lease filters reach the orders parquet scan as PushedFilters
      (plain-column predicates, not the CASE-derived forms);
    * the lease build aggregates BEFORE the string casts (argmax over
      longs, dictionary-sized cast after).
    """
    from etl_verkada_spark.pipeline.features import flagship_flat

    df = flagship_flat(spark, "/root/testdata/sf0.001")
    df.write.mode("overwrite").format("noop").save()
    plan = df._jdf.queryExecution().executedPlan().toString()

    # nation x region inside the site build, site dim probe, lease
    # probe; a 4th join would mean the camera ACL self-join crept back
    assert plan.count("BroadcastHashJoin") == 3
    # customer is scanned exactly once (the probe side)
    assert sum(
        "customer.parquet" in ln for ln in plan.splitlines()
        if "Scan parquet" in ln or "FileScan" in ln
    ) <= 1
    # probe side never shuffles: the single Exchange belongs to the
    # lease aggregate build
    assert plan.count("Exchange hashpartitioning") == 1
    assert "max_by" in plan  # J2 argmax present (lease_id is output)
    # pushed lease predicates on the orders scan
    assert "In(o_orderstatus, [O,P]" in plan
    assert "GreaterThanOrEqual(o_totalprice,1000.0)" in plan
