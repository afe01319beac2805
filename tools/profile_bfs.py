"""Decompose graph_bfs_levels (r15 verdict item 2): per-level job tax
vs compute; A/B current eager-per-level vs two-level fold vs fully
lazy (single job, bounded depth).

Usage: python tools/profile_bfs.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_verkada_spark.registry import build_registry  # noqa: E402
from etl_verkada_spark.session import get_spark  # noqa: E402
from etl_verkada_spark.operators.graph import (  # noqa: E402
    BFS_MAX_LEVEL,
    BFS_SOURCE,
    _edges,
)
from etl_verkada_spark.checkpoints import release  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def t5(mk, n=5):
    mk().write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        mk().write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def lazy_bfs(spark, sf_dir):
    """No per-level checkpoint: depth is bounded (4), so one job."""
    edges = _edges(spark, sf_dir).localCheckpoint(eager=True)
    visited = spark.createDataFrame(
        [(BFS_SOURCE, 0)], "node long, level int"
    )
    frontier = visited
    for lvl in range(1, BFS_MAX_LEVEL + 1):
        nxt = (
            edges.join(
                F.broadcast(frontier), edges["src"] == frontier["node"]
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(F.broadcast(visited), "node", "left_anti")
            .withColumn("level", F.lit(lvl))
        )
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited.select(
        F.when(F.col("node") % 2 == 0, F.lit("part"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node div 2").alias("node_key"),
        F.col("level").cast("int").alias("level"),
    )


def folded_bfs(spark, sf_dir):
    """Two levels per eager checkpoint: halves the per-round job tax."""
    edges = _edges(spark, sf_dir).localCheckpoint(eager=True)
    visited = spark.createDataFrame(
        [(BFS_SOURCE, 0)], "node long, level int"
    ).localCheckpoint(eager=True)
    frontier = visited
    lvl = 1
    while lvl <= BFS_MAX_LEVEL:
        nxt1 = (
            edges.join(
                F.broadcast(frontier), edges["src"] == frontier["node"]
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(F.broadcast(visited), "node", "left_anti")
            .withColumn("level", F.lit(lvl))
        )
        if lvl + 1 <= BFS_MAX_LEVEL:
            vis1 = visited.unionByName(nxt1)
            nxt2 = (
                edges.join(
                    F.broadcast(nxt1), edges["src"] == nxt1["node"]
                )
                .select(F.col("dst").alias("node"))
                .distinct()
                .join(F.broadcast(vis1), "node", "left_anti")
                .withColumn("level", F.lit(lvl + 1))
                .localCheckpoint(eager=True)
            )
            nxt1 = nxt1.localCheckpoint(eager=True)
            visited = visited.unionByName(nxt1).unionByName(nxt2)
            frontier = nxt2
            lvl += 2
        else:
            nxt1 = nxt1.localCheckpoint(eager=True)
            visited = visited.unionByName(nxt1)
            frontier = nxt1
            lvl += 1
    release(edges)
    return visited.select(
        F.when(F.col("node") % 2 == 0, F.lit("part"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node div 2").alias("node_key"),
        F.col("level").cast("int").alias("level"),
    )


def main() -> None:
    spark = get_spark("profile-bfs")
    registry = build_registry()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry["agg_count"].fn(spark, sf).write.mode("overwrite").format(
        "noop"
    ).save()
    for _ in range(4):
        spark.range(1).write.mode("overwrite").format("noop").save()

    r = {}
    r["edges_build"] = t5(
        lambda: _edges(spark, sf).agg(F.count(F.lit(1)).alias("n"))
    )
    r["current"] = t5(lambda: registry["graph_bfs_levels"].fn(spark, sf))
    r["lazy"] = t5(lambda: lazy_bfs(spark, sf))
    r["folded2"] = t5(lambda: folded_bfs(spark, sf))
    n_cur = registry["graph_bfs_levels"].fn(spark, sf).count()
    n_lazy = lazy_bfs(spark, sf).count()
    n_fold = folded_bfs(spark, sf).count()
    print(f"rows current={n_cur} lazy={n_lazy} folded={n_fold}")

    import duckdb
    from etl_verkada_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    sql = registry["graph_bfs_levels"].oracle
    con.execute(sql).fetchall()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    r["duck"] = best
    for k, v in r.items():
        print(f"{k:16s} {v:7.3f}s")


if __name__ == "__main__":
    main()


def edge_variants() -> None:
    spark = get_spark("profile-bfs2")
    registry = build_registry()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from etl_verkada_spark.catalog import table
    registry["agg_count"].fn(spark, sf).write.mode("overwrite").format(
        "noop"
    ).save()
    for _ in range(4):
        spark.range(1).write.mode("overwrite").format("noop").save()

    def edges_v2():
        li = table(spark, sf, "lineitem").select(
            (F.col("l_partkey") * 2).alias("p"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        ).distinct()
        fwd = li.select(F.col("p").alias("src"), F.col("s").alias("dst"))
        rev = li.select(F.col("s").alias("src"), F.col("p").alias("dst"))
        return fwd.unionByName(rev)

    r = {}
    r["edges_current"] = t5(
        lambda: _edges(spark, sf).agg(F.count(F.lit(1)).alias("n"))
    )
    r["edges_distinct_first"] = t5(
        lambda: edges_v2().agg(F.count(F.lit(1)).alias("n"))
    )
    n1 = _edges(spark, sf).count()
    n2 = edges_v2().count()
    print(f"edge rows current={n1} v2={n2}")
    for k, v in r.items():
        print(f"{k:24s} {v:7.3f}s")
