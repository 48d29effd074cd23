"""Graph analytics over relational edge tables.

`dedup.connected_components` (large/small-star) handles the
reachability family; this module holds the value-propagation family —
PageRank first (Page et al. 1999), the canonical power iteration a
warehouse engine runs over an edge table without leaving SQL/DataFrame
semantics.

Determinism contract: the iteration is specified as an INTEGER
micro-unit recurrence — rank mass in parts of 10⁹, per-edge
contribution ``(85 · r(u) · w) // (100 · W(u))``, teleport
``(15·10⁹ // 100) // N`` — so every engine replays it bit-for-bit
(integer sums are order-independent; there is no float anywhere, the
kaplan_meier convention). The floor divisions leak ≤ 1 micro-unit of
mass per edge per iteration; that loss is part of the spec, not an
error term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PR_SCALE = 10**9
PR_DAMP_NUM = 85
PR_DAMP_DEN = 100


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """Weighted PageRank, ``iters`` unrolled power iterations of the
    integer micro-unit recurrence. Expects a DIRECTED edge table; pass
    both directions for an undirected graph (then no node dangles —
    dangling mass otherwise just evaporates, documented).

    Output: (node, pr_x1e9). Overflow bound: 85·r·w must fit int64 —
    r ≤ 10⁹ mass units, so per-edge weight up to ~10⁸ is safe.

    Scale: each iteration is ONE edge-keyed join plus ONE dst groupBy —
    the standard power-iteration shuffle pair, linear in |E|; the node
    table carries its teleport column so no driver collect happens
    anywhere. Hot (high-degree) vertices are the usual skew concern —
    the contribution sum is map-side combinable on dst, which absorbs
    them.
    """
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("long").alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    ncount = nodes.agg(F.count("*").cast("long").alias("n"))
    tele = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    nodes_t = nodes.crossJoin(F.broadcast(ncount)).select(
        "node",
        F.expr(f"{tele} div n").cast("long").alias("tele"),
        F.expr(f"{PR_SCALE} div n").cast("long").alias("r0"),
    )
    outw = e.groupBy("src").agg(F.sum("w").cast("long").alias("wout"))
    ew = e.join(outw, "src")
    ranks = nodes_t.select("node", F.col("r0").alias("r"))
    for _ in range(iters):
        contrib = (
            ew.join(ranks, ew.src == ranks.node)
            .select(
                "dst",
                F.expr(
                    f"({PR_DAMP_NUM} * r * w) div ({PR_DAMP_DEN} * wout)"
                ).cast("long").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("s"))
        )
        ranks = (
            nodes_t.join(contrib, nodes_t.node == contrib.dst, "left")
            .select(
                "node",
                (F.col("tele") + F.coalesce(F.col("s"), F.lit(0)))
                .cast("long")
                .alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("pr_x1e9"))
