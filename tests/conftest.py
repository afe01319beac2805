"""Shared fixtures: one SparkSession per test session, DuckDB oracle,
and the driver-compare helper (the same canonicalization as
tools/parity_check.py)."""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys
from collections import Counter

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


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def assert_matches_oracle(sdf, con, sql: str) -> None:
    """Replicates the driver's compare: row count + column names +
    order-insensitive canonicalized value multiset."""
    scols = sdf.columns
    srows = sdf.collect()
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), (sorted(scols), sorted(ocols))
    assert len(srows) == len(orows), (len(srows), len(orows))
    s_idx = [scols.index(c) for c in sorted(scols)]
    o_idx = [ocols.index(c) for c in sorted(ocols)]
    sm = Counter(tuple(canon(r[i]) for i in s_idx) for r in srows)
    om = Counter(tuple(canon(r[i]) for i in o_idx) for r in orows)
    if sm != om:
        raise AssertionError(
            f"value mismatch; spark-only={list((sm - om).items())[:3]} "
            f"oracle-only={list((om - sm).items())[:3]}"
        )
