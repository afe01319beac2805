"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash -> CORRECTNESS_r{N}.json).

All implementations live in the ``etl_verkada_spark`` package; this
module only adapts its registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_verkada_spark.registry import build_registry

_REGISTRY = build_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's entire
    control() pipeline (scan -> filter -> last-wins dedup -> broadcast
    join -> ACL gate -> nested GeoJSON Feature projection -> conditional
    video enrichment), instantiated over the TPC-H tables."""
    from etl_verkada_spark.pipeline.features import flagship_features

    return flagship_features(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable SQL equivalents; omitted entries are rows-only."""
    return {
        name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None
    }
