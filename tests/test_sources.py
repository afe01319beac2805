"""REST connector tests against the in-process HTTP stub: pagination
parallelism (S1), cursor-cycle guard (O6), bounded-concurrency upsert
with PATCH/POST routing and error isolation (S9/O4)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from etl_verkada_spark.sources.http_stub import make_server
from etl_verkada_spark.sources import rest as rest_sources
from etl_verkada_spark.sinks.rest import upsert_partition, upsert_to_rest

ITEMS = [{"id": f"it-{i:03d}", "value": i} for i in range(103)]
SCHEMA_DDL = "id string, value int"


@pytest.fixture()
def stub():
    server, port, stats = make_server(ITEMS)
    yield f"http://127.0.0.1:{port}", stats
    server.shutdown()


def test_paged_rest_reads_everything_in_parallel(spark, stub):
    base, stats = stub
    rest_sources.register(spark)
    df = (
        spark.read.format("paged_rest")
        .option("url", f"{base}/items")
        .option("schema_ddl", SCHEMA_DDL)
        .option("limit", 10)
        .option("pages_per_task", 2)
        .load()
    )
    # multiple input partitions -> pages fetched by parallel tasks
    assert df.rdd.getNumPartitions() > 1
    rows = df.collect()
    assert len(rows) == len(ITEMS)
    assert {r["id"] for r in rows} == {it["id"] for it in ITEMS}
    # server-side LIMIT honored (O5): no page asked for more than `limit`
    item_reqs = [p for m, p in stats.requests if p.startswith("/items") and "limit=10" in p]
    assert len(item_reqs) == 11  # ceil(103/10) pages


def test_cursor_rest_follows_tokens(spark, stub):
    base, _ = stub
    rest_sources.register(spark)
    df = (
        spark.read.format("cursor_rest")
        .option("url", f"{base}/cursor")
        .option("schema_ddl", SCHEMA_DDL)
        .load()
    )
    rows = df.collect()
    assert len(rows) == len(ITEMS)


def test_cursor_cycle_guard_terminates(spark):
    """A server that repeats the last token would loop the naive client
    forever; the O6 guard (task.ts:160-166) must terminate exactly."""
    server, port, _ = make_server(ITEMS, repeat_last_token=True)
    try:
        rest_sources.register(spark)
        df = (
            spark.read.format("cursor_rest")
            .option("url", f"http://127.0.0.1:{port}/cursor")
            .option("schema_ddl", SCHEMA_DDL)
            .load()
        )
        rows = df.collect()
        assert len(rows) == len(ITEMS)  # each item exactly once
    finally:
        server.shutdown()


def _actions_df(spark, n=40):
    rows = []
    for i in range(n):
        action = ["patch", "post", "skip"][i % 3]
        rows.append(
            (
                f"cam-{i}",
                action,
                f"lease-{i}" if action == "patch" else None,
                json.dumps({"name": f"cam {i}"}),
            )
        )
    return spark.createDataFrame(
        rows, "id string, action string, lease_id string, payload_json string"
    )


def test_upsert_sink_routing_and_concurrency(spark, stub):
    base, stats = stub
    df = _actions_df(spark)
    upsert_to_rest(df, f"{base}/lease", max_in_flight=5, max_partitions=2)
    patches = [p for m, p in stats.requests if m == "PATCH"]
    posts = [p for m, p in stats.requests if m == "POST"]
    assert len(patches) == 14  # 40 rows: 14 patch, 13 post, 13 skip
    assert len(posts) == 13
    assert all("/lease/lease-" in p for p in patches)
    # bounded fan-out (O4): never more in flight than partitions x cap
    assert stats.max_in_flight <= 2 * 5


def test_upsert_error_isolation():
    """Unreachable server: failures counted, never raised (allSettled,
    task.ts:277)."""
    rows = [
        {"id": "a", "action": "post", "lease_id": None, "payload_json": "{}"},
        {"id": "b", "action": "skip", "lease_id": None, "payload_json": "{}"},
    ]
    ok, failed = upsert_partition(
        iter(rows), "http://127.0.0.1:1/unreachable", timeout=0.2
    )
    assert (ok, failed) == (1, 1)  # the skip succeeds, the post fails quietly


# --- file-format sources: JSON / CSV land-then-read --------------------------

def test_json_land_then_read_roundtrip(spark, tmp_path):
    """The land-then-read pattern with JSON lines: explicit schema on
    read (no inference job), values identical to the parquet original."""
    from etl_verkada_spark.catalog import table
    from pyspark.sql import functions as F

    orig = table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "orders_json")
    orig.write.json(path)
    back = spark.read.schema(
        "o_orderkey long, o_orderstatus string, o_totalprice double"
    ).json(path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, orig.collect())
    )


def test_json_permissive_quarantines_corrupt_rows(spark, tmp_path):
    """PERMISSIVE mode (the lenient S3 path): corrupt lines land in
    _corrupt_record instead of failing the read; valid rows parse."""
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"k": 1, "v": "ok"}\n'
        "this is not json\n"
        '{"k": 2, "v": "also ok"}\n'
    )
    df = spark.read.schema(
        "k long, v string, _corrupt_record string"
    ).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    ).json(str(p))
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["k"] for r in good} == {1, 2}
    assert len(bad) == 1 and "not json" in bad[0]["_corrupt_record"]


def test_csv_land_then_read_roundtrip(spark, tmp_path):
    """CSV with explicit schema + header: doubles survive the text
    round trip via the canonical repr."""
    from etl_verkada_spark.catalog import table

    orig = table(spark, "/root/testdata/sf0.001", "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    path = str(tmp_path / "customer_csv")
    orig.write.option("header", True).csv(path)
    back = spark.read.schema(
        "c_custkey long, c_name string, c_acctbal double"
    ).option("header", True).csv(path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, orig.collect())
    )


def test_auth_exchange_feeds_paged_scan(spark):
    """S6/S7 end-to-end (task.ts:97-141): API key -> POST /token bearer
    -> authed paged scan; footage token -> JWT + ACL lists. The server
    401s unauthenticated scans, so a passing read proves the bearer
    flowed from the driver pre-step to every executor fetch."""
    from etl_verkada_spark.sources import auth

    server, port, stats = make_server(
        ITEMS,
        api_key="k-123",
        acl={"accessibleCameras": ["it-001"], "accessibleSites": ["s-9"]},
    )
    base = f"http://127.0.0.1:{port}"
    try:
        rest_sources.register(spark)

        # unauthenticated scan is rejected (the 401 surfaces as a task
        # failure wrapping HTTP Error 401)
        with pytest.raises(Exception, match="401"):
            (
                spark.read.format("paged_rest")
                .option("url", f"{base}/items")
                .option("schema_ddl", SCHEMA_DDL)
                .load()
                .collect()
            )

        token = auth.exchange_token(base, "k-123")
        df = (
            spark.read.format("paged_rest")
            .option("url", f"{base}/items")
            .option("schema_ddl", SCHEMA_DDL)
            .option("limit", 10)
            .option("auth_token", token)
            .load()
        )
        assert df.count() == len(ITEMS)
        assert ("POST", "/token") in stats.requests

        # S7: scoped credential -> ACL table -> streamability gate
        st = auth.fetch_stream_token(base, "k-123")
        assert st.jwt == "stub-jwt"
        acl_df = auth.acl_dataframe(spark, st)
        rows = {(r["kind"], r["acl_id"]) for r in acl_df.collect()}
        assert rows == {("camera", "it-001"), ("site", "s-9")}

        from etl_verkada_spark.pipeline.features import acl_flag

        cams = spark.createDataFrame(
            [("it-001", "s-1"), ("it-002", "s-9"), ("it-003", "s-2")],
            "camera_id string, site_id string",
        )
        flags = {
            r["camera_id"]: r["streamable"]
            for r in acl_flag(cams, acl_df).collect()
        }
        assert flags == {"it-001": True, "it-002": True, "it-003": False}

        # bad API key is rejected at the exchange
        with pytest.raises(Exception, match="401"):
            auth.exchange_token(base, "wrong")
    finally:
        server.shutdown()


def test_paged_rest_zero_indexed_pages(spark):
    """The reference API convention: first page is page=0 and the loop
    condition is total > limit*page (task.ts:117-127). first_page=0
    must fetch every item exactly once against such a server."""
    server, port, stats = make_server(ITEMS, zero_indexed_pages=True)
    base = f"http://127.0.0.1:{port}"
    try:
        rest_sources.register(spark)
        df = (
            spark.read.format("paged_rest")
            .option("url", f"{base}/items")
            .option("schema_ddl", SCHEMA_DDL)
            .option("limit", 10)
            .option("first_page", 0)
            .load()
        )
        rows = df.collect()
        assert len(rows) == len(ITEMS)
        assert {r["id"] for r in rows} == {it["id"] for it in ITEMS}
        pages = sorted(
            int(p.split("page=")[1])
            for _, p in stats.requests
            if "limit=10" in p
        )
        assert pages == list(range(11))  # 0..10, ceil(103/10) pages
    finally:
        server.shutdown()


# --- reference .typed() fidelity: schema-violating page mid-scan ------------

#: a wrong-typed item buried mid-corpus: `value` arrives as a string
#: where the declared schema says int (the payload shape the reference's
#: .typed() throw and the v1.17.0 null-token fix defend against,
#: task.ts:155-158 / CHANGELOG.md:16)
BAD_ITEMS = (
    ITEMS[:47]
    + [{"id": "it-bad", "value": "forty-seven"}]
    + ITEMS[47:60]
)


@pytest.fixture()
def bad_stub():
    server, port, stats = make_server(BAD_ITEMS)
    yield f"http://127.0.0.1:{port}", stats
    server.shutdown()


def test_paged_failfast_aborts_on_schema_violating_page(spark, bad_stub):
    """S1 + FAILFAST (the default): the scan must DIE when a mid-scan
    page violates the declared schema — not null the field, not skip
    the row (the reference's .typed() throw, task.ts:155-158)."""
    base, _ = bad_stub
    rest_sources.register(spark)
    df = (
        spark.read.format("paged_rest")
        .option("url", f"{base}/items")
        .option("schema_ddl", SCHEMA_DDL)
        .option("limit", 10)
        .load()
    )
    with pytest.raises(Exception, match="FAILFAST"):
        df.collect()


def test_cursor_failfast_aborts_on_schema_violating_page(spark, bad_stub):
    """S2 + FAILFAST: same contract through the sequential cursor."""
    base, _ = bad_stub
    rest_sources.register(spark)
    df = (
        spark.read.format("cursor_rest")
        .option("url", f"{base}/cursor")
        .option("schema_ddl", SCHEMA_DDL)
        .load()
    )
    with pytest.raises(Exception, match="FAILFAST"):
        df.collect()


def test_paged_permissive_quarantines_schema_violation(spark, bad_stub):
    """S1 + PERMISSIVE: the violating ITEM is quarantined whole — data
    fields null, raw payload JSON in _corrupt_record — and every clean
    row still lands (Spark's JSON-reader convention, mirrored by the
    source so the reference's throw is a MODE, not hardcoded)."""
    base, _ = bad_stub
    rest_sources.register(spark)
    df = (
        spark.read.format("paged_rest")
        .option("url", f"{base}/items")
        .option("schema_ddl", SCHEMA_DDL + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("limit", 10)
        .load()
    )
    rows = df.collect()
    assert len(rows) == len(BAD_ITEMS)
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1
    assert bad[0]["id"] is None and bad[0]["value"] is None
    assert json.loads(bad[0]["_corrupt_record"]) == {
        "id": "it-bad", "value": "forty-seven",
    }
    good = [r for r in rows if r["_corrupt_record"] is None]
    assert {r["id"] for r in good} == {
        it["id"] for it in BAD_ITEMS if it["id"] != "it-bad"
    }
