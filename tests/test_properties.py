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
