"""Link-graph analytics over harvested links: in-degree and PageRank.

The crawl's links sink (operators/export.links_sink, trwritetools'
WriteLinks) emits (src_host, dst_host) edges; ranking hosts by link mass
drives frontier prioritization (a rank-weighted `priority` replaces the
uniform hash priority in frontier.harvest_links) and corpus-quality
weighting downstream.

``pagerank`` is the iterative original-paper formulation over hosts:

    rank_{k+1}(v) = (1 - d) + d * sum_{u -> v} rank_k(u) / outdeg(u)

expressed as K DataFrame join+groupBy rounds.  Each iteration is ONE
shuffle on dst (AQE may broadcast the static out-degree table when it is
small; no forced hint — it is one row per linking host, unbounded);
lineage is truncated every iteration (localCheckpoint) so the plan stays
flat at any K — on a cluster this becomes a parquet/Iceberg round table,
like the walker's round files.  Deterministic given the edge set, so the
driver oracle (q_pagerank) mirrors it as K unrolled SQL CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def in_degree(edges: DataFrame) -> DataFrame:
    """(dst, in_degree) from an edge list (src, dst)."""
    return edges.groupBy("dst").agg(F.count("*").alias("in_degree"))


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint: bool = True,
) -> DataFrame:
    """(node, rank) after ``iterations`` synchronous updates.

    Nodes = union of srcs and dsts; initial rank 1.0.  Dangling nodes
    (no out-edges) keep contributing nothing, matching the unnormalized
    original formulation the SQL oracle mirrors."""
    if checkpoint:
        # r06: edges / nodes / outdeg are loop-invariant, but without a
        # materialization every iteration's action re-evaluates their whole
        # lineage (the edge-derivation scan ran 3x per pagerank call, the
        # node-dedup twice more on top).  Checkpoint them once (guide §5:
        # cut lineage of reused intermediates; on a cluster this is the
        # same per-round parquet/Iceberg table the loop docstring names).
        edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=False)
        outdeg = outdeg.localCheckpoint(eager=False)
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for _ in range(iterations):
        contribs = (
            # No broadcast hint on outdeg: it has one row per host with
            # out-links (1e7-1e8 at the north rule's scale) — multi-GB, a
            # driver-killer if forced per iteration.  AQE broadcasts it
            # only when it is actually small.
            edges.join(outdeg, "src")
            .join(ranks, edges.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("mass"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
