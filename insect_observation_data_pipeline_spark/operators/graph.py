"""Weighted PageRank over an edge relation.

The second iterative graph operator next to min-label propagation
(llm/dedup.py connected_components): where components answer "which
near-dups belong together", PageRank ranks nodes by stationary visit
probability — the standard importance score for link/citation/trade
graphs. Same Spark iteration idiom as connected_components: per round
one join + one groupBy shuffle on the edge relation, ``localCheckpoint``
to cut the exponentially-growing lineage, no driver-side data collects
(scalars like N and the dangling mass stay 1-row DataFrames that
broadcast into the rank update).

Cross-engine determinism (the oracle replays the iteration as unrolled
CTEs): edge weights are exact integers, the probability p = w / W_out is
one double division of exact ints, and every float literal (teleport
mass, damping) is computed ONCE in Python and passed verbatim to both
engines — so both run the identical expression tree and differ only in
float summation order (~1e-15 relative), absorbed by stable_round at 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    damping: float = 0.85,
    iterations: int = 8,
) -> DataFrame:
    """(node, rank) after ``iterations`` rounds of weighted PageRank.

    r_{t+1}(v) = (1-d)/N + d * (sum_{u->v} r_t(u) * w(u,v)/W_out(u)
                                + dangling_t / N)

    where dangling_t is the rank mass sitting on nodes with no
    out-edges (redistributed uniformly, the standard fix — without it
    dangling nodes leak mass and ranks no longer sum to 1). Fixed
    iteration count keeps the result a pure function of the input (no
    convergence race) and lets an oracle unroll the recurrence.
    """
    # One persist on the edge relation itself: nodes/outw/ep all derive
    # from it, and the caller's edge lineage is typically the expensive
    # part (h4's is a lineitem join chain) — without this it would
    # recompute once per derived frame (the x34b 6x-recompute lesson).
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).alias("w"),
    ).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("w_out")).persist()
    ep = (
        e.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("w_out").cast("double")).alias("p"))
        .persist()
    )
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))

    teleport = 1.0 - damping  # computed once; oracle embeds repr() of this
    ranks = (
        nodes.crossJoin(F.broadcast(nn))
        .select("node", (F.lit(1.0) / F.col("n").cast("double")).alias("rank"))
        .localCheckpoint()
    )
    for _ in range(iterations):
        contrib = (
            ep.join(ranks, ep["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("c"))
        )
        dang = (
            ranks.join(outw, ranks["node"] == outw["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                (
                    F.lit(teleport) / F.col("n").cast("double")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("dm") / F.col("n").cast("double")
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
