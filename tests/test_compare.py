"""Regression tests for the driver-replica comparator (compare.py).

The two r3 dtype fixes — pd.NA canonicalized as NULL, timedelta kind
deliberately NOT folded into datetime — landed without tests; these lock
them so a refactor of canon_cell/compare_frames can't silently regress
the local gate's driver-faithfulness.
"""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd

from etl_verkada_spark.compare import canon_cell, compare_frames


def test_pd_na_and_nat_canonicalize_as_null():
    assert canon_cell(pd.NA) == "NULL"
    assert canon_cell(pd.NaT) == "NULL"
    assert canon_cell(None) == "NULL"
    # NaN is a float VALUE, not a null — the driver hashes it distinctly
    assert canon_cell(float("nan")) == "f:NaN"


def test_pd_na_column_matches_none_column():
    """DuckDB's .df() materializes nullable ints with pd.NA; Spark's
    toPandas() gives object/None. Same values must compare equal."""
    spark_pdf = pd.DataFrame({"v": pd.array([1, None, 3], dtype="object")})
    oracle_pdf = pd.DataFrame({"v": pd.array([1, pd.NA, 3], dtype="Int64")})
    # Int64 extension dtype has kind 'i', object has kind 'O' -> the
    # driver sees the VALUES after pandas hashing; the local gate flags
    # kind drift only between hash-relevant kinds. Compare values via
    # the canonical multiset directly:
    from etl_verkada_spark.compare import frame_multiset

    assert frame_multiset(spark_pdf) == frame_multiset(oracle_pdf)


def test_timedelta_kind_not_folded_into_datetime():
    s = pd.DataFrame({"v": pd.to_timedelta(["1 day", "2 days"])})
    o = pd.DataFrame(
        {"v": pd.to_datetime(["2026-01-01", "2026-01-02"])}
    )
    problems = compare_frames(s, o)
    assert problems and "dtype-kind mismatch" in problems[0]


def test_unsigned_signed_int_kinds_fold_together():
    s = pd.DataFrame({"v": np.array([1, 2], dtype="uint32")})
    o = pd.DataFrame({"v": np.array([1, 2], dtype="int64")})
    assert compare_frames(s, o) == []


def test_int_vs_float_kind_is_a_mismatch():
    """The original round-2 failure mode: DuckDB HUGEINT -> float64
    vs Spark int64 must FAIL the gate even when values look equal."""
    s = pd.DataFrame({"v": np.array([1, 2], dtype="int64")})
    o = pd.DataFrame({"v": np.array([1.0, 2.0], dtype="float64")})
    problems = compare_frames(s, o)
    assert problems and "dtype-kind mismatch" in problems[0]


def test_value_multiset_is_order_insensitive():
    s = pd.DataFrame({"a": [2, 1], "b": ["y", "x"]})
    o = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    assert compare_frames(s, o) == []
    o_bad = pd.DataFrame({"a": [1, 2], "b": ["x", "z"]})
    assert compare_frames(s, o_bad)


def test_timestamp_and_date_distinct():
    assert canon_cell(pd.Timestamp("2026-01-01")).startswith("t:")
    assert canon_cell(datetime.date(2026, 1, 1)).startswith("D:")


def test_clean_tmp_never_touches_spark_dirs_mid_run(tmp_path, monkeypatch):
    """The r6 postmortem guard: _clean_tmp without prune_spark_dirs must
    not delete Spark scratch dirs however old they are (the age-based
    prune once deleted the live JVM's own blockmgr dir mid-run and
    wiped 31/35 sf1 queries); with the flag it must prune only dirs
    older than min_age_s."""
    import os
    import time as _time

    import bench

    old_dir = tmp_path / "blockmgr-old"
    new_dir = tmp_path / "blockmgr-new"
    duck = tmp_path / "duckdb_bench_tmp"
    for d in (old_dir, new_dir, duck):
        d.mkdir()
    os.utime(old_dir, (_time.time() - 3600, _time.time() - 3600))

    import glob as _glob
    real_glob = _glob.glob
    monkeypatch.setattr(
        _glob, "glob",
        lambda pat: real_glob(pat.replace("/tmp/", f"{tmp_path}/")),
    )

    bench._clean_tmp(patterns=(str(duck),))
    assert old_dir.exists() and new_dir.exists(), (
        "mid-run hygiene must never touch Spark dirs"
    )
    assert not duck.exists(), "DuckDB temp must be dropped"

    duck.mkdir()
    bench._clean_tmp(patterns=(str(duck),), prune_spark_dirs=True)
    assert not old_dir.exists(), "startup prune must drop stale dirs"
    assert new_dir.exists(), "startup prune must keep fresh dirs"


def test_bench_stdout_line_fits_driver_capture():
    """The driver captures only the last 2000 bytes of bench stdout and
    parses the final line as JSON; BENCH_r02-r06 were parsed:null
    because the final line outgrew that window. Pin the budget against
    the REAL round-6 record (the worst case observed), plus a synthetic
    2x-larger registry to prove graceful degradation never overflows."""
    import json
    import os

    import bench

    full_path = os.path.join(os.path.dirname(bench.__file__), "BENCH_FULL.json")
    with open(full_path) as f:
        full = json.load(f)
    line = bench.compact_stdout_line(
        full["value"], full["sf"], full["queries"],
        full["spark_fixed_overhead_sec"], full["duckdb"], full["sf1"],
        "/tmp/bench_full.json",
    )
    assert len(line) < bench.STDOUT_LINE_BUDGET <= 1950
    rec = json.loads(line)
    assert rec["queries"] and rec["sf1"]["ratio"], (
        "real-size record must keep both the driver-contract queries "
        "dict and the sf1 crossover ratios"
    )

    # partial (pre-sf1) line: also parseable and within budget
    pline = bench.compact_stdout_line(
        full["value"], full["sf"], full["queries"],
        full["spark_fixed_overhead_sec"], full["duckdb"], None,
        "/tmp/bench_full.json", partial=True,
    )
    assert len(pline) < bench.STDOUT_LINE_BUDGET
    assert json.loads(pline)["partial"] is True

    # 2x registry growth: degradation drops fields, never overflows
    big_t = {f"very_long_query_name_number_{i:03d}": 1.234 for i in range(80)}
    big_sf1 = {
        "ratio_floor_adjusted": {k: 3.21 for k in big_t},
        "unstable": list(big_t)[:10],
        "spark_only": {k: 1.0 for k in list(big_t)[:10]},
        "cold_sec": {k: 2.0 for k in list(big_t)[:5]},
        "free_disk_gb_at_start": 80.0,
        "errors": {"x": "y"},
    }
    bline = bench.compact_stdout_line(
        99.9, 1.0, big_t, 0.03, {k: 0.5 for k in big_t}, big_sf1, "/tmp/x.json",
    )
    assert len(bline) < bench.STDOUT_LINE_BUDGET
    brec = json.loads(bline)
    # degradation must be VISIBLE on the record: either a truncation
    # marker (the round-9 ladder trims timings/ratios in place, the
    # preferred path) or an explicit drop list
    assert (
        brec.get("dropped_for_size")
        or brec.get("queries_truncated")
        or brec.get("sf1", {}).get("ratio_truncated")
    ), "oversized record must mark its degradation"

    # mid-size record (slightly over budget, no cold/spark_only to
    # shed): the unstable LIST must degrade to a COUNT — never vanish —
    # before any adjudication-critical dict is dropped
    mid_t = {f"query_name_{i:03d}": 1.234 for i in range(36)}
    mid_sf1 = {
        "ratio_floor_adjusted": {k: 3.21 for k in mid_t},
        "unstable": list(mid_t)[:12],
        "free_disk_gb_at_start": 80.0,
    }
    mline = bench.compact_stdout_line(
        9.9, 1.0, mid_t, 0.03, {k: 0.5 for k in mid_t}, mid_sf1, "/tmp/x.json",
    )
    mrec = json.loads(mline)
    assert len(mline) < bench.STDOUT_LINE_BUDGET
    assert "sf1" in mrec and "queries" in mrec, mrec.get("dropped_for_size")
    if "unstable" not in mrec["sf1"]:
        assert mrec["sf1"]["n_unstable"] == 12, (
            "shedding must keep at least the unstable COUNT"
        )
