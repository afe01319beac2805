"""Driver-faithful result comparison (the local correctness gate).

The external correctness driver collects BOTH engines' results as pandas
DataFrames (Spark via ``toPandas()``, DuckDB via ``.df()``), sorts the
columns by name, sorts the rows by all columns, and hashes the values.
That pipeline is *dtype-sensitive*: a DuckDB ``SUM`` over an integer
column returns HUGEINT, which pandas materializes as **float64**, so an
oracle written as ``SUM(x)`` hashes ``0.0`` where Spark's long hashes
``0`` — rows and schema match, the value hash does not (observed in
round 2: ``llm_text_stats``, ``win_sessionize``,
``validate_expectations``).

The earlier local gate compared ``collect()`` against ``fetchall()``,
where DuckDB converts HUGEINT to a plain Python ``int`` — hiding exactly
that class of divergence.  This module goes through pandas on both sides
and canonicalizes each cell *with its numpy dtype kind*, so int-vs-float
(and every other representation drift the driver can see) fails locally
first.
"""

from __future__ import annotations

import datetime
import decimal
import math
from collections import Counter

import numpy as np
import pandas as pd


def canon_cell(v) -> str:
    """Canonical, dtype-kind-prefixed string for one pandas cell.

    Integer-kind and float-kind values canonicalize differently on
    purpose (``i:5`` vs ``f:5.0``): the driver's hash distinguishes
    them, so the local gate must too.  Width within a kind is ignored
    (int32 vs int64 hash identically under pandas hashing).
    """
    if v is None:
        return "NULL"
    # pandas nulls: NaT, NA, NaN (also covers numpy float nan)
    if v is pd.NaT:
        return "NULL"
    if v is pd.NA:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "b:T" if v else "b:F"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "f:NaN"
        return f"f:{f!r}"
    if isinstance(v, decimal.Decimal):
        # decimal reaching pandas means the engines disagree on type
        # already; keep it distinguishable rather than coercing.
        return f"d:{v}"
    if isinstance(v, pd.Timestamp):
        return f"t:{v.isoformat()}"
    if isinstance(v, datetime.datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"D:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        items = ",".join(f"{k}={canon_cell(x)}" for k, x in sorted(v.items()))
        return "{" + items + "}"
    return f"s:{v}"


def frame_multiset(pdf: pd.DataFrame) -> Counter:
    cols = sorted(pdf.columns)
    out: Counter = Counter()
    for row in pdf[cols].itertuples(index=False, name=None):
        out[tuple(canon_cell(v) for v in row)] += 1
    return out


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of human-readable problems (empty == driver-green).

    Checks, in driver order: column names, row count, per-column pandas
    dtype *kind* (int vs float vs object vs datetime — the hash-relevant
    distinction), then the order-insensitive canonical value multiset.
    """
    problems: list[str] = []
    scols, ocols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if scols != ocols:
        return [f"columns spark={scols} oracle={ocols}"]
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(
            f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
        )
    kind_mismatch = []
    for c in scols:
        sk = spark_pdf[c].dtype.kind
        ok = oracle_pdf[c].dtype.kind
        # unsigned/signed both count as integer kind; timedelta ('m') is
        # deliberately NOT folded into datetime ('M') — the driver's hash
        # distinguishes them.
        norm = {"u": "i"}
        if norm.get(sk, sk) != norm.get(ok, ok):
            kind_mismatch.append(f"{c}: spark={spark_pdf[c].dtype} oracle={oracle_pdf[c].dtype}")
    if kind_mismatch:
        problems.append("dtype-kind mismatch (driver hash WILL differ): " + "; ".join(kind_mismatch))
    if not problems:
        sm = frame_multiset(spark_pdf)
        om = frame_multiset(oracle_pdf)
        if sm != om:
            extra_s = list((sm - om).items())[:3]
            extra_o = list((om - sm).items())[:3]
            problems.append(
                f"values differ; spark-only={extra_s} oracle-only={extra_o} (cols={scols})"
            )
    return problems
