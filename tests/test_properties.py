"""Property-based algebraic laws (SURVEY.md §5.4) with hypothesis.

Small generated inputs, one shared session; each law is the algebraic
guarantee an operator's 100 TB behavior leans on (e.g. merge
convergence is what makes task-retry + at-least-once delivery safe).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_verkada_spark.operators.dedup import last_wins
from etl_verkada_spark.streaming.upsert import merge_last_wins

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # key
        st.integers(min_value=0, max_value=50),  # ord
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=0,
    max_size=25,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, o, v, i) for i, (k, o, v) in enumerate(rows)],
        "k int, ord int, v int, uid int",
    )


@given(rows=rows_st)
@SETTINGS
def test_last_wins_idempotent(spark, rows):
    df = _df(spark, rows)
    once = last_wins(df, ["k"], ["ord", "uid"])
    twice = last_wins(once, ["k"], ["ord", "uid"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(rows=rows_st, rows2=rows_st)
@SETTINGS
def test_merge_convergence(spark, rows, rows2):
    """merge(merge(s, b), b) == merge(s, b): re-delivering a batch (task
    retry / at-least-once schedule) cannot change the final state."""
    state = _df(spark, rows)
    batch = _df(spark, rows2).withColumn("uid", F.col("uid") + 1000)
    m1 = merge_last_wins(state, batch, ["k"], ["ord", "uid"])
    m2 = merge_last_wins(m1, batch, ["k"], ["ord", "uid"])
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))


@given(rows=rows_st)
@SETTINGS
def test_filter_projection_commute(spark, rows):
    df = _df(spark, rows)
    pred = F.col("v") > 0
    a = df.filter(pred).select("k", "v")
    b = df.select("k", "v").filter(pred)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


@given(rows=rows_st)
@SETTINGS
def test_dropduplicates_idempotent(spark, rows):
    df = _df(spark, rows).select("k", "ord")
    once = df.dropDuplicates()
    twice = once.dropDuplicates()
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(rows=rows_st, rows2=rows_st)
@SETTINGS
def test_union_count_additive(spark, rows, rows2):
    a, b = _df(spark, rows), _df(spark, rows2)
    assert a.unionByName(b).count() == a.count() + b.count()


# --- exact scaled-long sums (aggregates.py fast path) ------------------------

money_st = st.lists(
    # 2-decimal values as scaled ints, carried through a double column the
    # way the testdata stores money
    st.integers(min_value=-10**9, max_value=10**9),
    min_size=1,
    max_size=40,
)


@given(cents=money_st)
@SETTINGS
def test_scaled_long_sum_equals_decimal_sum(spark, cents):
    """SUM over scaled longs == SUM over DECIMAL casts, bit-identical
    after the unscale division — the equivalence the hot aggregates rely
    on (agg_groupby, join_sortmerge, win_frame, stream_tumble)."""
    from etl_verkada_spark.operators.aggregates import scaled_long, unscale

    df = spark.createDataFrame(
        [(c / 100.0,) for c in cents], "x double"
    )
    got = df.agg(
        unscale(F.sum(scaled_long("x")), 2).alias("fast"),
        F.sum(F.col("x").cast("decimal(28,2)")).cast("double").alias("exact"),
    ).first()
    assert got["fast"] == got["exact"]


@given(cents=money_st)
@SETTINGS
def test_scaled_long_roundtrip_identity(spark, cents):
    """floor(x*100+0.5) recovers the true scaled integer for every
    representable 2-decimal double, positive and negative."""
    from etl_verkada_spark.operators.aggregates import scaled_long

    df = spark.createDataFrame([(c,) for c in cents], "c long")
    out = df.select(
        "c", scaled_long(F.col("c") / F.lit(100.0)).alias("rt")
    ).collect()
    assert all(r["rt"] == r["c"] for r in out)


def test_events_value_nonnegative():
    """Fixture-domain guard for ts_interpolate's integer half-up
    rounding: `(2*total + den) div (2*den)` is engine-identical only for
    total >= 0 (Spark div truncates toward zero, DuckDB // floors), and
    total >= 0 iff events.value >= 0. If regenerated testdata ever goes
    signed, this fails before a silent 1-ulp oracle divergence does."""
    import pyarrow.dataset as ds
    import pyarrow.compute as pc

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = ds.dataset(f"/root/testdata/{sf}/events.parquet")
        lo = pc.min(d.to_table(columns=["value"]).column("value")).as_py()
        assert lo >= 0, f"{sf}: min(events.value) = {lo} < 0"


def test_documents_text_ascii():
    """Fixture-domain guard for mm_frame_sample's oracle: DuckDB has no
    BLOB substring, so the oracle slices the VARCHAR and relies on
    byte == char. That identity holds only for ASCII text; regenerated
    testdata with multi-byte characters would silently shift every
    frame offset in the oracle but not in the Spark binary path."""
    import pyarrow.dataset as ds

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = ds.dataset(f"/root/testdata/{sf}/documents.parquet")
        for batch in d.to_batches(columns=["text"]):
            for t in batch.column("text"):
                s = t.as_py()
                assert len(s) == len(s.encode("utf-8")), (
                    f"{sf}: non-ASCII text would break the byte==char "
                    "assumption in ORACLE_MM_FRAME_SAMPLE"
                )


def test_interval_merge_islands_disjoint(spark):
    """Coalesced intervals per user must be pairwise disjoint (no two
    islands overlap or touch) and each must span >= one event lease."""
    from etl_verkada_spark.operators.timeseries import (
        SPAN_US,
        ts_interval_merge,
    )

    rows = (
        ts_interval_merge(spark, "/root/testdata/sf0.001")
        .orderBy("user_id", "start_us")
        .collect()
    )
    assert rows
    by_user: dict = {}
    for r in rows:
        assert r["end_us"] - r["start_us"] >= SPAN_US
        assert r["n_events"] >= 1
        prev = by_user.get(r["user_id"])
        if prev is not None:
            assert r["start_us"] > prev, (r["user_id"], prev, r["start_us"])
        by_user[r["user_id"]] = r["end_us"]


def test_rollup_hierarchy_levels_consistent(spark):
    """Each coarser level's totals must equal the sum of its finer
    children — the mergeable-partial invariant the cascade relies on."""
    from etl_verkada_spark.operators.timeseries import ts_rollup_hierarchy

    df = ts_rollup_hierarchy(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    totals = {}
    for r in rows:
        t = totals.setdefault(r["level"], [0, 0.0])
        t[0] += r["n_events"]
        t[1] += r["sum_val"]
    assert totals["1h"][0] == totals["6h"][0] == totals["1d"][0]
    assert abs(totals["1h"][1] - totals["1d"][1]) < 1e-6


def test_bfs_levels_edge_consistency(spark):
    """BFS levels must satisfy the triangle property: adjacent nodes'
    levels differ by at most 1, the source is level 0, and every level
    > 0 node has a neighbor one level closer."""
    from etl_verkada_spark.operators.graph import (
        BFS_SOURCE,
        graph_bfs_levels,
        _edges,
    )

    sf = "/root/testdata/sf0.001"
    levels = {}
    for r in graph_bfs_levels(spark, sf).collect():
        node = r["node_key"] * 2 + (0 if r["node_type"] == "part" else 1)
        levels[node] = r["level"]
    assert levels.get(BFS_SOURCE) == 0
    edges = [(r["src"], r["dst"]) for r in _edges(spark, sf).collect()]
    has_parent = {BFS_SOURCE}
    for s, d in edges:
        if s in levels and d in levels:
            assert abs(levels[s] - levels[d]) <= 1
            if levels.get(d) == levels.get(s, -99) + 1:
                has_parent.add(d)
    uncapped = {n for n, lv in levels.items() if lv < 4}
    assert uncapped <= has_parent | {
        n for n, lv in levels.items() if lv == 0
    }


def test_weighted_median_definition(spark):
    """The reported value must be the smallest price whose cumulative
    weight reaches half the group total (lower weighted median)."""
    from collections import defaultdict

    from etl_verkada_spark.operators.aggregates import agg_weighted_median
    from etl_verkada_spark.catalog import table

    sf = "/root/testdata/sf0.001"
    li = table(spark, sf, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect()
    acc = defaultdict(list)
    for r in li:
        cents = int(r["l_extendedprice"] * 100 + 0.5)
        acc[r["l_returnflag"]].append((cents, int(r["l_quantity"])))
    got = {
        r["l_returnflag"]: r["weighted_median_price"]
        for r in agg_weighted_median(spark, sf).collect()
    }
    for flag, pairs in acc.items():
        pairs.sort()
        total = sum(w for _, w in pairs)
        cum = 0
        for v, w in pairs:
            cum += w
            if 2 * cum >= total:
                assert abs(got[flag] - v / 100.0) < 1e-9, flag
                break


def test_boilerplate_coverage_bounds(spark):
    """Covered tokens never exceed the doc length; zero-coverage docs
    are present; coverage_ppm is exactly the integer ratio."""
    from etl_verkada_spark.llm.text import llm_boilerplate_coverage

    rows = llm_boilerplate_coverage(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    n_covered = 0
    for r in rows:
        assert 0 <= r["covered_tokens"] <= r["n_tokens"]
        assert r["coverage_ppm"] == r["covered_tokens"] * 1_000_000 // (
            r["n_tokens"]
        )
        n_covered += r["covered_tokens"] > 0
    assert n_covered > 0


def test_perplexity_filter_drops_exact_quartile(spark):
    """Kept set size must be exactly n - n//4 of the scored docs, no
    kept doc may land in a strictly lower SCORE BUCKET than a dropped
    one (the r11 quantized-gate semantics: ranking is over
    avg_s6 div PERPLEXITY_QUANT_S6, ties broken by doc_id), and the
    kept set must equal the Python recompute of that exact rule."""
    from etl_verkada_spark.llm.text import (
        PERPLEXITY_QUANT_S6,
        llm_bigram_score,
        llm_perplexity_filter,
    )
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    scored = llm_bigram_score(spark, sf).select(
        "doc_id", F.expr("score_s6_sum div n_bigrams").alias("avg_s6")
    ).collect()
    kept = {r["doc_id"] for r in llm_perplexity_filter(spark, sf).collect()}
    n = len(scored)
    assert len(kept) == n - n // 4
    ranked = sorted(
        scored,
        key=lambda r: (r["avg_s6"] // PERPLEXITY_QUANT_S6, r["doc_id"]),
    )
    assert kept == {r["doc_id"] for r in ranked[n // 4:]}
    dropped_max_q = max(
        (r["avg_s6"] // PERPLEXITY_QUANT_S6 for r in ranked[: n // 4]),
        default=None,
    )
    kept_min_q = min(
        r["avg_s6"] // PERPLEXITY_QUANT_S6
        for r in ranked
        if r["doc_id"] in kept
    )
    if dropped_max_q is not None:
        assert kept_min_q >= dropped_max_q


def test_cdc_merge_ops_roundtrip(spark):
    """apply(old, diff(old, new)) must reproduce new exactly."""
    from etl_verkada_spark.operators.cdc import _snapshots, cdc_merge_ops

    sf = "/root/testdata/sf0.001"
    _, new = _snapshots(spark, sf)
    applied = {
        r["o_orderkey"]: (r["o_orderstatus"], r["o_totalprice"])
        for r in cdc_merge_ops(spark, sf).collect()
    }
    expect = {
        r["o_orderkey"]: (r["o_orderstatus"], r["o_totalprice"])
        for r in new.collect()
    }
    assert applied == expect


def test_asof_fwd_tolerance_and_order(spark):
    """Every matched click is at-or-after its purchase within the
    tolerance, and is the EARLIEST such click for that user."""
    from collections import defaultdict

    from etl_verkada_spark.operators.joins import (
        ASOF_FWD_TOL_US,
        join_asof_fwd,
    )
    from etl_verkada_spark.catalog import table
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    clicks = defaultdict(list)
    ev = table(spark, sf, "events").filter(
        F.col("event_type") == "click"
    ).select("user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
    for r in ev.collect():
        clicks[r["user_id"]].append(r["us"])
    for c in clicks.values():
        c.sort()
    out = join_asof_fwd(spark, sf).collect()
    assert out
    n_matched = 0
    for r in out:
        expect = next(
            (
                c
                for c in clicks.get(r["user_id"], [])
                if c >= r["ts_us"] and c - r["ts_us"] <= ASOF_FWD_TOL_US
            ),
            None,
        )
        assert r["next_click_us"] == expect, r
        if expect is not None:
            assert r["wait_us"] == expect - r["ts_us"]
            n_matched += 1
    assert n_matched > 0


def test_bitmap_distinct_equals_exact(spark):
    """The bitmap popcount must equal plain COUNT(DISTINCT)."""
    from etl_verkada_spark.operators.aggregates import agg_bitmap_distinct
    from etl_verkada_spark.catalog import table
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    got = {
        r["l_returnflag"]: r["n_distinct_parts"]
        for r in agg_bitmap_distinct(spark, sf).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert got == exact


def test_cusum_statistic_definition(spark):
    """max_abs_sn must equal max_t |n*prefix_t - t*total| recomputed
    driver-side, with the earliest peak hour reported."""
    from collections import defaultdict

    from etl_verkada_spark.operators.timeseries import HOUR_US, ts_cusum
    from etl_verkada_spark.catalog import table
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    hourly = defaultdict(dict)
    rows = (
        table(spark, sf, "events")
        .select(
            "event_type",
            F.expr(f"unix_micros(cast(ts as timestamp)) div {HOUR_US}")
            .alias("b"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"),
        )
        .groupBy("event_type", "b")
        .agg(F.sum("c").alias("x"))
        .collect()
    )
    for r in rows:
        hourly[r["event_type"]][r["b"]] = r["x"]
    got = {r["event_type"]: r for r in ts_cusum(spark, sf).collect()}
    for et, series in hourly.items():
        xs = sorted(series.items())
        n = len(xs)
        total = sum(v for _, v in xs)
        prefix = 0
        best, best_b = -1, None
        for t, (b, v) in enumerate(xs, start=1):
            prefix += v
            s = abs(n * prefix - t * total)
            if s > best:
                best, best_b = s, b
        assert got[et]["max_abs_sn"] == best, et
        assert got[et]["peak_hour_us"] == best_b * HOUR_US, et
        assert got[et]["n_hours"] == n


def test_subquery_all_vacuous_truth(spark):
    """A supplier in a nation with NO customers must qualify (ALL over
    the empty set is true) — verified by checking the implementation
    against a driver-side replay."""
    from etl_verkada_spark.operators.subqueries import subquery_all
    from etl_verkada_spark.catalog import table
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    mx = {
        r["c_nationkey"]: r["m"]
        for r in table(spark, sf, "customer")
        .filter(
            (F.col("c_mktsegment") == "BUILDING")
            & (F.col("c_acctbal") > 9000.0)
        )
        .groupBy("c_nationkey")
        .agg(F.max("c_acctbal").alias("m"))
        .collect()
    }
    got = {r["s_suppkey"] for r in subquery_all(spark, sf).collect()}
    for r in table(spark, sf, "supplier").collect():
        qualifies = (
            r["s_nationkey"] not in mx
            or r["s_acctbal"] > mx[r["s_nationkey"]]
        )
        assert (r["s_suppkey"] in got) == qualifies, r["s_suppkey"]


# --- REST source .typed() gate (pure-Python, no Spark) -----------------------

_TYPED_SCHEMA_DDL = (
    "sid string, n bigint, x double, ok boolean, _corrupt_record string"
)


def _typer(mode: str):
    from pyspark.sql.types import StructType

    from etl_verkada_spark.sources.rest import _ItemTyper

    schema = StructType.fromDDL(_TYPED_SCHEMA_DDL)
    return _ItemTyper(schema, {"mode": mode}, "paged_rest")


_good_item = st.fixed_dictionaries(
    {},
    optional={
        "sid": st.text(max_size=8),
        "n": st.integers(-(2**62), 2**62),
        "x": st.one_of(
            st.integers(-1000, 1000),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
        ),
        "ok": st.booleans(),
    },
)

#: one field deliberately wrong-typed (bool counts as wrong for bigint
#: and double — the Python bool-is-int trap the typer must not fall into)
_bad_item = st.one_of(
    st.fixed_dictionaries({"sid": st.integers()}),
    st.fixed_dictionaries({"n": st.one_of(st.text(), st.booleans())}),
    st.fixed_dictionaries({"x": st.one_of(st.text(), st.booleans())}),
    st.fixed_dictionaries({"ok": st.one_of(st.integers(), st.text())}),
)


@settings(
    max_examples=200, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(item=_good_item)
def test_typed_failfast_accepts_every_conforming_item(spark, item):
    del spark  # only needed so StructType.fromDDL has an active session
    row = _typer("FAILFAST").row(item)
    # field order mirrors the DDL; missing keys become None
    assert row == (
        item.get("sid"), item.get("n"), item.get("x"), item.get("ok"),
        None,
    )


@settings(
    max_examples=200, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(item=_bad_item)
def test_typed_failfast_raises_and_permissive_quarantines(spark, item):
    del spark  # active session for StructType.fromDDL
    import json as _json

    import pytest as _pytest

    with _pytest.raises(ValueError, match="FAILFAST"):
        _typer("FAILFAST").row(item)
    row = _typer("PERMISSIVE").row(item)
    # whole item quarantined: data fields null, raw payload preserved
    assert row[:4] == (None, None, None, None)
    assert _json.loads(row[4]) == item


# ---------------------------------------------------------------------------
# ts_lttb pick-ordering pack (r13): the single DECIMAL(38,0) scalar
# ``-2A * PACK_X*PACK_ID + x*PACK_ID + event_id`` must order exactly like
# the lexicographic tuple (-2A, x, event_id) for every in-range input —
# the hash-aggregable pick is only correct because this holds.
# ---------------------------------------------------------------------------

_LTTB_AREA_MAX = 10**13  # documented headroom bound on |2A|


def _lttb_keys():
    from etl_verkada_spark.operators.timeseries import (
        LTTB_PACK_ID,
        LTTB_PACK_X,
    )

    return st.tuples(
        st.integers(min_value=0, max_value=_LTTB_AREA_MAX),
        st.integers(min_value=0, max_value=LTTB_PACK_X - 1),
        st.integers(min_value=0, max_value=LTTB_PACK_ID - 1),
    )


@settings(max_examples=500, deadline=None)
@given(a=_lttb_keys(), b=_lttb_keys())
def test_lttb_pack_orders_like_the_tuple(a, b):
    from etl_verkada_spark.operators.timeseries import (
        LTTB_PACK_ID,
        LTTB_PACK_X,
    )

    def pack(area2, x, eid):
        return -area2 * LTTB_PACK_X * LTTB_PACK_ID + x * LTTB_PACK_ID + eid

    # the pick minimizes ordt; the tuple form minimizes (-2A, x, eid)
    ta, tb = (-a[0], a[1], a[2]), (-b[0], b[1], b[2])
    pa, pb = pack(*a), pack(*b)
    assert (pa < pb) == (ta < tb)
    assert (pa == pb) == (ta == tb)
    # every packed value must stay inside DECIMAL(38,0)
    assert abs(pa) < 10**38


@settings(max_examples=300, deadline=None)
@given(a=_lttb_keys(), b=_lttb_keys())
def test_lttb_first_last_bucket_pack_orders(a, b):
    """First-bucket packs must order by (x asc, eid asc) and
    last-bucket packs by (x desc, eid asc) — minimizing either matches
    the documented edge-bucket pick."""
    from etl_verkada_spark.operators.timeseries import LTTB_PACK_ID

    (_, xa, ea), (_, xb, eb) = a, b
    first_a, first_b = xa * LTTB_PACK_ID + ea, xb * LTTB_PACK_ID + eb
    assert (first_a < first_b) == ((xa, ea) < (xb, eb))
    last_a, last_b = -xa * LTTB_PACK_ID + ea, -xb * LTTB_PACK_ID + eb
    assert (last_a < last_b) == ((-xa, ea) < (-xb, eb))
