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
    """Kept set size must be exactly n - n//4 of the scored docs, and
    no kept doc may score strictly below a dropped one."""
    from etl_verkada_spark.llm.text import (
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
    ranked = sorted(scored, key=lambda r: (r["avg_s6"], r["doc_id"]))
    dropped_max = max(
        (r["avg_s6"] for r in ranked[: n // 4]), default=None
    )
    kept_min = min(r["avg_s6"] for r in ranked if r["doc_id"] in kept)
    if dropped_max is not None:
        assert kept_min >= dropped_max


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
