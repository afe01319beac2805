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
* EAGER-CONSTRUCTION contract (r14): a few callables run bounded
  driver-side jobs at DataFrame-CONSTRUCTION time (``collect()`` of a
  cell-sized table that parameterizes the plan — agg_weighted_median's
  median-bucket pick, ts_lttb's cell table) and embed the result as
  literals. The returned plan is therefore frozen against the source
  as read at build time: rebuild via the registry callable after any
  data change instead of caching the DataFrame, and expect cluster
  jobs from the call itself, not just from the action.
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
# ROTATION POLICY (stable since r5; each round's window recorded in that
# round's CORRECTNESS_r0N.json): slot 1 is the flagship; then (a) queries
# that have never had a driver row (this round's additions), (b) queries
# whose IMPLEMENTATION or oracle changed this round (comment-only edits
# don't count), (c) fill with the oldest-evidence rows. Past slot 50:
# driver-green from an earlier round with unchanged code, plus full
# parity coverage via tools/parity_check.py.
#
# ROUND-15 WINDOW. CORRECTNESS_r14 went 50/50 green; cumulatively all
# 228 registered queries carry a hash-green driver row. Evidence state
# entering r15 (newest hash-green driver round -> count, computed from
# CORRECTNESS_r01..r14): r9 -> 16, r10 -> 36, r11 -> 33, r12 -> 46,
# r13 -> 47, r14 -> 50; never -> 0. Per the policy:
#   1. flagship;
#   2. clause (a) — empty (nothing unchecked);
#   3. clause (b) — IMPLEMENTATION or oracle changed in round 15 (11;
#      the r14 policy note undercounted its changes at 7 — llm_tfidf
#      landed after that window was pinned, so it seats FIRST here per
#      the r14 verdict item 4): llm_tfidf (one-exchange rewrite r14 +
#      r15 size-gated df broadcast), llm_dedup_containment (doc-scale
#      checkpoint, window df, one tokenize), graph_bfs_levels /
#      graph_pagerank / graph_degree_hist / graph_label_propagation
#      (shared _edges build: distinct-before-direction-fan-out),
#      llm_boilerplate_coverage (occurrence-table checkpoint),
#      llm_lexical_diversity (repartition-by-doc pre-explode, one
#      exchange), agg_weighted_median (empty-input guard),
#      dq_referential (one-scan-per-child chained-left-join audit),
#      agg_approx (late-r15: the exact judge no longer shares a mixed
#      distinct aggregate with the sketch — the per-distinct-key HLL
#      partial buffer was 413 longs/key through the exchange; sketch
#      now builds over the deduped keys, bit-identical estimate,
#      1.96 -> 0.85 s isolated);
#   4. clause (c) fill (38 slots): the whole remaining r9-evidence
#      cohort (16), then the first 22 of the 36 r10-evidence rows,
#      alphabetical (pivot displaced by the agg_approx seat).
# R16 QUEUE (clause c fill order, unless displaced by r16 changes):
# the remaining r10-evidence rows (pivot, project_struct_nested,
# scan_partition_pruned, skyline_pareto, stream_session,
# stream_stateful, stream_stream_join, stream_tumble, ts_autocorr,
# ts_mad_anomaly, ts_ohlc, udf_pandas), then the r11 cohort (33 rows)
# alphabetical.
PRIORITY_ORDER: tuple[str, ...] = (
    # flagship
    "flagship_flat",
    # -- 3. round-15 implementation changes (clause b) --
    "llm_tfidf",
    "llm_dedup_containment",
    "graph_bfs_levels",
    "graph_pagerank",
    "graph_degree_hist",
    "graph_label_propagation",
    "llm_boilerplate_coverage",
    "llm_lexical_diversity",
    "agg_weighted_median",
    "dq_referential",
    "agg_approx",
    # -- 4a. r9-evidence cohort (clause c, oldest evidence; whole set) --
    "llm_token_count",
    "mm_binary_stats",
    "mm_feature_extract",
    "scan_csv_land",
    "scd2_apply",
    "sort_topn_per_key",
    "subquery_all",
    "ts_cusum",
    "ts_gapfill",
    "ts_interval_merge",
    "ts_rolling_median",
    "ts_rollup_hierarchy",
    "ts_seasonal_baseline",
    "validate_expectations",
    "win_pattern_match",
    "win_sessionize",
    # -- 4b. r10-evidence cohort (clause c fill, 22 of 36, alphabetical) --
    "agg_collect",
    "agg_gini",
    "agg_mode",
    "agg_salted",
    "cdc_snapshot_diff",
    "dq_benford",
    "fx_math",
    "geo_geofence_join",
    "join_bucketed",
    "join_range",
    "llm_clean_pipeline",
    "llm_dedup_fuzzy",
    "llm_dedup_ngram",
    "llm_dedup_prefixfilter",
    "llm_eval_ngram_recall",
    "llm_quality_repetition",
    "llm_sample_reservoir",
    "llm_shard",
    "llm_sim_ann_ivf",
    "llm_sim_pairs",
    "llm_winnowing",
    "mm_resize_stub",
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
    from .llm import bpe
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
        bpe,
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
