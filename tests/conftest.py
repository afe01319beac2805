"""Shared fixtures: one SparkSession per test session, DuckDB oracle,
and the driver-compare helper (the same canonicalization as
tools/parity_check.py)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_verkada_spark.catalog import TABLES  # noqa: E402
from etl_verkada_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("etl-verkada-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    yield con
    con.close()


from etl_verkada_spark.compare import canon_cell as canon  # noqa: E402,F401
from etl_verkada_spark.compare import compare_frames  # noqa: E402


def assert_matches_oracle(sdf, con, sql: str) -> None:
    """Replicates the driver's compare: both engines' results go through
    pandas (Spark ``toPandas()``, DuckDB ``.df()``) exactly like the
    driver's canonicalizer, then column names + row count + per-column
    dtype kind + order-insensitive canonical value multiset
    (etl_verkada_spark/compare.py)."""
    spdf = sdf.toPandas()
    opdf = con.execute(sql).df()
    problems = compare_frames(spdf, opdf)
    if problems:
        raise AssertionError(" | ".join(problems))
