"""The local replica of the driver's correctness gate: every registered
query runs; every oracle-paired query must match DuckDB at sf0.001.

(tools/parity_check.py is the same gate as a standalone script, also
runnable at sf0.01 — see .claude/skills/verify/SKILL.md.)
"""

from __future__ import annotations

import pytest

from etl_verkada_spark.registry import build_registry

from .conftest import SF_SMALL, assert_matches_oracle

REGISTRY = build_registry()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query(name, spark, oracle):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF_SMALL)
    if q.oracle is None:
        # rows-only contract: runs, deterministic row count across reruns
        n1 = sdf.count()
        n2 = q.fn(spark, SF_SMALL).count()
        assert n1 == n2
    else:
        assert_matches_oracle(sdf, oracle, q.oracle)
