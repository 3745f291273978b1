"""Iterative graph analytics on DataFrames: PageRank.

Connected components (the dedup workhorse) lives in
``operators/dedup.py``; this module adds the rank-propagation family.
The loop shape is the canonical iterative-Spark pattern: per round one
join (ranks onto edges) + one keyed aggregation (contributions by
destination), lineage truncated with lazy ``localCheckpoint`` so the
plan doesn't grow by a join per round. At 100 TB: pre-partition edges
and ranks by node id so the per-round join is co-partitioned, swap
``localCheckpoint`` for reliable ``checkpoint``.

Engine-parity contract (same recipe as the IVF codebook training):
per-destination contribution sums run in DECIMAL(30,18) — exact and
order-independent, so results are bit-identical in any engine that
follows the recipe — with the scalar damping arithmetic in double.
An external SQL oracle reproduces the iterations verbatim
(``queries/analyticsq.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    n_iter: int = 3,
) -> DataFrame:
    """PageRank over a directed edge list, ``n_iter`` synchronous
    iterations from the uniform start: r₀ = 1/N and

        r_{t+1}(v) = (1−d)/N + d · Σ_{u→v} r_t(u) / outdeg(u).

    No dangling-mass redistribution: a node with no out-edges keeps
    absorbing rank (total mass < 1) — callers wanting the stochastic
    variant add reverse edges or a sink node. Deterministic: the
    contribution sum is DECIMAL (order-independent), every other step
    is double arithmetic on identical inputs.

    Per iteration: one equi-join of the 2-column rank table onto the
    edges and one sum keyed by destination — both shuffles keyed by
    node id, so bucketing both tables by node makes the loop
    exchange-free on a cluster. Node payloads never enter the loop.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # Degree rides the edge table through the loop (computed once).
    ed = e.join(deg, "src").localCheckpoint()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        contrib = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                "dst",
                (F.col("rank") / F.col("outdeg"))
                .cast("decimal(30,18)")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
