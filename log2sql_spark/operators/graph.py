"""Distributed graph primitives shared by the graph query family.

``connected_components`` is min-label propagation WITH pointer jumping
(the Shiloach–Vishkin shortcut): each round pulls neighbors' labels
through one shuffle join + min-aggregate, then re-resolves every label
through the label table itself (a label is a node id, so ``label :=
label_of(label)`` halves the remaining distance to the component
minimum) — O(log diameter) rounds instead of O(diameter). Labels are
monotonically non-increasing bigints, so the fixed point is detected by
an order-free integer SUM the driver compares between rounds — no
row-wise diff join. Lineage is truncated per round with an eager
localCheckpoint (the BFS/PageRank lesson: an un-checkpointed iterative
plan doubles per round, and the cost is re-analysis, not data). At
100 TB the identical loop shape holds with both joins shuffling on
their keys; Kiveris et al.'s large-star/small-star is this plan with a
degree-aware orientation.

Reference analog: none (305-LoC CDC parser); extension surface. The
dedup clustering operator (operators/dedup.py::dedup_clusters) runs the
same fixed-point shape over LSH candidate edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, max_rounds: int = 30
) -> DataFrame:
    """Label every node of an undirected graph with its component's
    minimum node id. ``edges`` needs bigint columns ``src``/``dst``
    (one row per direction, or pass any orientation — the first round
    symmetrizes). Returns (node, label). Deterministic: the converged
    labeling is unique regardless of execution order."""
    und = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    labels = (
        und.select("src")
        .distinct()
        .select(F.col("src").alias("node"), F.col("src").alias("label"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_rounds):  # cap >> log2(diameter); sum-check exits early
        prop = und.join(labels, und.src == labels.node).select(
            F.col("dst").alias("node"), F.col("label")
        )
        stepped = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # pointer jump: a label is itself a node id, so re-resolve it
        # through the label table — halves the remaining distance to
        # the component minimum every round (O(log diameter) total).
        jump = stepped.select(
            F.col("node").alias("jnode"), F.col("label").alias("jlabel")
        )
        labels = (
            stepped.join(jump, stepped.label == jump.jnode)
            .select("node", F.col("jlabel").alias("label"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:  # labels only decrease: equal sum == fixed point
            break
        prev_sum = cur_sum
    return labels


def kcore(edges: DataFrame, k: int, max_rounds: int = 40) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where
    every node has degree ≥ k, computed by parallel peeling — each
    round drops ALL nodes whose degree among survivors is < k, and a
    drop can cascade (removing a node lowers its neighbors' degrees).
    ``edges`` needs bigint ``src``/``dst`` (any orientation; the first
    step symmetrizes). Returns (node, core_degree) for the surviving
    nodes, where core_degree is the node's degree WITHIN the core —
    the fraud-ring / community-nucleus primitive (k-cores survive the
    tree-like periphery that dominates real bipartite activity graphs).

    Round shape: one shuffle join of the (shrinking) survivor set to
    the static symmetrized edge list, one count aggregate, one HAVING
    filter. The survivor set only shrinks, so the fixed point is
    detected by comparing counts between rounds (an order-free
    integer, no row diff); lineage is truncated per round with an
    eager localCheckpoint like every iterative operator here. At
    100 TB the loop holds: edges shuffle on their endpoint key, the
    survivor side is the small one after the first cascades, and the
    peel is O(rounds · |E|) with rounds bounded by the degeneracy
    ordering depth, not |V|.

    Self-loops are dropped up front (standard k-core semantics — a
    node is never its own neighbor), and non-convergence within
    ``max_rounds`` RAISES rather than silently returning an
    unconverged superset with inflated core_degree.
    """
    if max_rounds < 1:
        raise ValueError(f"kcore: max_rounds must be >= 1, got {max_rounds}")
    fwd = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und = (
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    alive = und.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    n_alive = alive.count()
    for _ in range(max_rounds):
        deg = (
            alive.join(und, alive.node == und.src)
            .join(
                alive.select(F.col("node").alias("other")),
                F.col("dst") == F.col("other"),
            )
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("core_degree"))
        )
        survivors = deg.filter(F.col("core_degree") >= k).localCheckpoint(
            eager=True
        )
        n_next = survivors.count()
        alive = survivors.select("node")
        if n_next == n_alive:  # nothing peeled: fixed point
            return survivors
        n_alive = n_next
        if n_next == 0:
            return survivors
    raise RuntimeError(
        f"kcore: peeling did not converge within max_rounds={max_rounds} "
        f"({n_alive} nodes still changing); raise max_rounds — returning "
        "the unconverged superset would silently inflate core_degree"
    )
