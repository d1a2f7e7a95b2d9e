"""Iterative graph analytics over edge DataFrames.

Connected components live in ``dedup.dup_clusters`` (min-label
propagation); this module adds PageRank — the canonical "would this
survive 100x" iterative operator: every round is ONE equi-join plus one
map-side-combinable aggregate over the edge list, O(E) shuffle per
round, no driver state at all (compare k-means' O(k·dim) driver
collect).

Determinism (the repo-wide rule): ranks are int64 FIXED POINT.  Every
step is integer arithmetic — ``rank DIV out_degree`` per edge, exact
int64 sums, ``(damping * sum) DIV 100`` — so the trajectory is
bit-identical in any engine and under any shuffle layout, and the
DuckDB oracle replays it with the same ``//`` arithmetic.  (Float
PageRank sums neighbor contributions in shuffle order — never
hash-stable cross-engine.)  Dangling-node mass is dropped rather than
redistributed, a documented simplification both engines share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    init: int = 1_000_000_000,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Integer-fixed-point PageRank: returns ``(node, rank)`` after
    ``iters`` rounds from a uniform ``init`` rank.

    rank'(v) = (100-d)% of init  +  d% of Σ_{u→v} (rank(u) DIV deg(u))

    ``nodes`` must cover every vertex (isolated nodes keep the base
    rank).  Per round: edges ⋈ ranks on src (hash join), per-dst sum
    (map-side combine), left-join back to nodes — each a single
    exchange; ``localCheckpoint`` truncates lineage so the plan does not
    grow with iterations (the dup_clusters pattern)."""
    # materialize the edge list once (r10 perf): each round's checkpoint
    # job otherwise re-derives the caller's full edge lineage (for
    # pagerank_docs that is the whole LSH shingle+band candidate
    # generation, re-run per round).  The edge list is the small proxy —
    # O(E) id pairs — exactly what should pin, not the text pipeline.
    # r11 NOTE: lazy (eager=False) pins were A/B-measured 1.46x SLOWER
    # here — the per-round AQE re-materialization under a lazy chain
    # costs more than the eager count() barriers it removes on this
    # iterative shape (unlike the cascade's one-shot tiers).  Eager stays.
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=True
    )
    n = nodes.select(F.col(node_col).alias("node"))
    base = (100 - damping_pct) * init // 100
    ranks = n.select("node", F.lit(init).cast("long").alias("rank"))
    for _ in range(iters):
        inc = (
            e.join(ranks, e.src == ranks.node)
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank DIV deg").cast("long").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            n.join(inc, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * coalesce(s, 0L)) DIV 100")
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
