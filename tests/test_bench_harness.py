"""Regression pins for the bench harness's failure-recovery paths —
round 9 lost an entire 90-minute sf1 section to one infeasible oracle;
these tests keep the fixes honest. No Spark session needed."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_sf1_progress_reconstruction(tmp_path, monkeypatch):
    p = tmp_path / "progress.jsonl"
    monkeypatch.setattr(bench, "_sf1_progress_path", lambda: str(p))
    rows = [
        {"k": "floor", "q": "floor_s", "v": 0.03},
        {"k": "duckdb", "q": "q1", "v": {"min": 0.1, "med": 0.1, "n": 5, "spread": 1.1}},
        {"k": "spark", "q": "q1", "v": {"min": 0.53, "med": 0.6, "n": 5, "spread": 1.2}},
        {"k": "spark", "q": "q2", "v": {"min": 1.0, "med": 1.0, "n": 5, "spread": 2.5}},
        {"k": "duckdb_cold", "q": "qc", "v": 6.8},
        {"k": "error", "q": "duckdb:bad", "v": "boom"},
    ]
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    out = bench._sf1_from_progress("section timeout")
    assert out["partial_from_progress"] is True
    # floor subtracted before the ratio
    assert out["ratio_floor_adjusted"]["q1"] == round(0.5 / 0.1, 2)
    # q2 has no duck pair -> no ratio, but its spread flags it unstable
    assert "q2" not in out["ratio_floor_adjusted"]
    assert "q2" in out["unstable"]
    assert out["cold_duckdb_sec"]["qc"] == 6.8
    assert out["errors"]["duckdb:bad"] == "boom"
    assert out["errors"]["section"] == "section timeout"


def test_sf1_progress_missing_file_degrades(monkeypatch, tmp_path):
    monkeypatch.setattr(
        bench, "_sf1_progress_path", lambda: str(tmp_path / "absent.jsonl")
    )
    out = bench._sf1_from_progress("err msg")
    assert out == {"error": "err msg"}


def test_duckdb_budget_interrupts_runaway():
    """A query slower than the budget must surface as an exception the
    caller records per-query (never a section hang)."""
    import duckdb

    con = duckdb.connect()
    orig = bench.SF1_DUCK_QUERY_BUDGET_S
    bench.SF1_DUCK_QUERY_BUDGET_S = 0.3
    try:
        try:
            # ~10^9-row cross join: far beyond the 0.3 s budget
            bench.run_duckdb_budgeted(
                con,
                "SELECT COUNT(*) FROM range(100000) a, range(100000) b "
                "WHERE (a.range*b.range) % 7 = 3",
                n_runs=2,
            )
            raised = False
        except Exception:
            raised = True
        assert raised
    finally:
        bench.SF1_DUCK_QUERY_BUDGET_S = orig


def test_infeasible_oracle_not_in_sf1_sets():
    """The prefixfilter pair op must never re-enter ANY sf1 set: its
    brute-force twin caused the round-9 total loss, and the Spark-side
    317 s measures the synthesizer's verbatim-clone artifact (100
    identical copies per doc), not the algorithm."""
    assert "llm_dedup_prefixfilter" not in bench.SF1_QUERIES
    assert "llm_dedup_prefixfilter" not in bench.SF1_SPARK_ONLY
    assert "llm_dedup_prefixfilter" not in bench.SF1_COLD_QUERIES


def test_stdout_line_budget_worst_case():
    """The final stdout line must fit the driver's tail capture with
    every current query in both sets."""
    timings = {q: 1.234 for q in bench.HEADLINE}
    duck = {q: 0.123 for q in bench.HEADLINE}
    sf1 = {
        "ratio_floor_adjusted": {q: 12.345 for q in bench.SF1_QUERIES},
        "unstable": ["a", "b", "c"],
        "free_disk_gb_at_start": 79.1,
        "errors": [1],
        "spark_only": {q: 1.23 for q in bench.SF1_SPARK_ONLY},
        "cold_sec": {"scd2_build": 1.76, "graph_pagerank": 11.43},
    }
    line = bench.compact_stdout_line(
        12.3, 0.1, timings, 0.027, duck, sf1, "/tmp/x.json"
    )
    assert len(line) < bench.STDOUT_LINE_BUDGET
    json.loads(line)
