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

from insect_observation_data_pipeline_spark.cache import tag_intermediates
from insect_observation_data_pipeline_spark.functions.numeric import stable_round


def unpersist_intermediates(df: DataFrame, blocking: bool = False) -> None:
    """Release the internal persisted frames backing an operator result.

    Round 12: the mechanism generalized to every persisting operator
    (dedup, tf-cosine, source-overlap) — this module-level name stays
    as the historical entry point and delegates to the shared
    :func:`insect_observation_data_pipeline_spark.cache.unpersist_intermediates`
    (round 13: this module tags through the shared helper too)."""
    from insect_observation_data_pipeline_spark.cache import (
        unpersist_intermediates as _shared,
    )

    _shared(df, blocking=blocking)


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

    Memory contract: four internal persists (edges, nodes, out-weights,
    transition probabilities) back the returned plan and stay pinned
    until the caller releases them — ``unpersist_intermediates(result)``
    after materializing, or ``spark.catalog.clearCache()`` in a
    multi-query harness.
    """
    # One persist on the edge relation itself: nodes/outw/ep all derive
    # from it, and the caller's edge lineage is typically the expensive
    # part (h4's is a lineitem join chain) — without this it would
    # recompute once per derived frame (the x34b 6x-recompute lesson).
    # NULL/non-positive weights are dropped as non-edges (round-13
    # review): they contribute no transition probability, and keeping
    # them made w/W_out a DIVIDE_BY_ZERO under ANSI (or a silent
    # rank-mass leak with ANSI off) for a node whose weights sum to 0.
    # A node ALL of whose edges drop leaves the graph entirely —
    # consistent with "the graph is the positive-weight edge set".
    e = (
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).alias("w"),
        )
        .filter(F.col("w") > 0)
        .persist()
    )
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
    return tag_intermediates(ranks, (e, nodes, outw, ep))


def triangle_counts(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle participation: (node, degree, n_triangles,
    clustering) over an UNDIRECTED edge relation (either orientation;
    duplicates and self-loops tolerated — canonicalized here). The
    third graph operator next to connected_components (membership) and
    pagerank (importance): triangles measure local cohesion, and
    2*tri / (deg*(deg-1)) is the local clustering coefficient.

    Join strategy is DEGREE ORIENTATION (Schank/Wagner): every edge is
    directed from its lower-(degree, node) endpoint to the higher one,
    so each triangle is enumerated exactly once and the wedge self-join
    fans out per node only over its ORIENTED out-degree — O(sqrt(m))
    max out-degree on any graph. That bound is what keeps hub nodes
    (the whole point of a skewed 100 TB graph) from turning the
    self-join quadratic; a naive src-grouped wedge join explodes on
    exactly those hubs. Three shuffles: degree count, wedge self-join
    on the pivot node, closing-edge join on (x, y).

    The count is a pure integer function of the edge set — orientation
    changes the enumeration order, never the result — so an oracle can
    replay it with the simple a<b<c three-way join.

    Plan-audit note: the executed-plan text reprints each persisted
    frame's FULL build lineage at every InMemoryTableScan reuse site,
    so PLANS_r{N}.json's substring-counted ``exchanges`` for queries
    using this operator (~60) overstates the real shuffle count (~10:
    edge build, degree agg, two orientation joins, wedge join, closing
    join, per-node agg) — the duplication is in the plan *text*, not
    the execution.

    Memory contract: three internal persists (canonical edges, degrees,
    oriented edges) back the returned plan and stay pinned until the
    caller releases them — ``unpersist_intermediates(result)`` after
    materializing, or ``spark.catalog.clearCache()`` in a multi-query
    harness (what bench.py / tools/scaling.py do).
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # canon feeds the degree count (two scans via the union) and
        # the orientation join; the caller's edge lineage is typically
        # the expensive part (h5's is a lineitem self-join + groupBy) —
        # same persist rationale as pagerank's edge relation
        .persist()
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .union(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .persist()
    )
    da = deg.select(
        F.col("node").alias("a"), F.col("degree").alias("deg_a")
    )
    db = deg.select(
        F.col("node").alias("b"), F.col("degree").alias("deg_b")
    )
    keyed = canon.join(da, "a").join(db, "b")
    lo_first = F.struct(F.col("deg_a"), F.col("a")) < F.struct(
        F.col("deg_b"), F.col("b")
    )
    oriented = keyed.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(
            lo_first, F.struct(F.col("deg_b").alias("d"), F.col("b").alias("n"))
        )
        .otherwise(F.struct(F.col("deg_a").alias("d"), F.col("a").alias("n")))
        .alias("v_key"),
    ).persist()
    w1 = oriented.select(
        F.col("u"), F.col("v").alias("x"), F.col("v_key").alias("x_key")
    )
    w2 = oriented.select(
        F.col("u"), F.col("v").alias("y"), F.col("v_key").alias("y_key")
    )
    wedges = w1.join(w2, "u").filter(F.col("x_key") < F.col("y_key"))
    closing = oriented.select(
        F.col("u").alias("x"), F.col("v").alias("y")
    )
    tris = wedges.join(closing, ["x", "y"]).select("u", "x", "y")
    per_node = (
        tris.select(F.explode(F.array("u", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    out = deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0))
        .cast("bigint")
        .alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            stable_round(
                2.0
                * F.coalesce(F.col("n_triangles"), F.lit(0))
                / (F.col("degree") * (F.col("degree") - F.lit(1))),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )
    return tag_intermediates(out, (canon, deg, oriented))
