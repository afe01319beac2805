"""Single source of truth: query name -> (Spark callable, oracle SQL).

Each operator family module exposes a ``QUERIES: dict[str, QuerySpec]``;
this module merges them. ``__spark_entry__.py`` re-exports the merged
registry to the correctness driver.

Conventions (BASELINE.md / driver contract):

* every callable has signature ``(spark, sf_dir) -> DataFrame``;
* every computed column is aliased identically in the Spark code and the
  oracle SQL (the driver sorts columns by name before hashing);
* float aggregations that are order-sensitive route through DECIMAL and
  cast back to DOUBLE so both engines produce bit-identical values;
* ``oracle=None`` marks genuinely non-SQL-expressible operators (LSH
  banding, streaming state, pandas-UDF ANN) -> driver runs the weaker
  rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One registered engine capability.

    Attributes:
        fn: the Spark implementation, ``(spark, sf_dir) -> DataFrame``.
        oracle: equivalent SQL DuckDB can run on the testdata views, or
            None for rows-only checks.
        tags: provenance labels, e.g. ``{"reference:J1", "beyond"}``.
        doc: one-line description for SURVEY §2 traceability.
    """

    fn: QueryFn
    oracle: str | None
    tags: frozenset[str] = field(default_factory=frozenset)
    doc: str = ""


def spec(
    fn: QueryFn, oracle: str | None, *tags: str, doc: str = ""
) -> QuerySpec:
    return QuerySpec(fn=fn, oracle=oracle, tags=frozenset(tags), doc=doc)


def build_registry() -> dict[str, QuerySpec]:
    """Merge every operator family's QUERIES dict. Import is deferred so a
    failure in one family (e.g. optional deps) surfaces per-query, not at
    module import of the driver entry point."""
    from .operators import aggregates, dedup, filters, joins, projections
    from .operators import reshape, scans, setops, sorts, subqueries, windows
    from .functions import scalars, udtfs
    from .pipeline import features
    from .llm import dedup as llm_dedup
    from .llm import multimodal, similarity, text
    from .streaming import joins as stream_joins
    from .streaming import stateful as stream_stateful
    from .streaming import windows as stream_windows
    from .streaming import upsert

    merged: dict[str, QuerySpec] = {}
    for module in (
        scans,
        filters,
        projections,
        joins,
        dedup,
        aggregates,
        windows,
        sorts,
        setops,
        reshape,
        subqueries,
        scalars,
        udtfs,
        features,
        llm_dedup,
        similarity,
        text,
        multimodal,
        stream_windows,
        stream_stateful,
        stream_joins,
        upsert,
    ):
        overlap = merged.keys() & module.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        merged.update(module.QUERIES)
    return merged
