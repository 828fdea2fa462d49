"""Graph analytics over relational data: PageRank on the trade graph.

The missing-category complement to the dedup connected-components
operator (operators/dedup.py::dedup_clusters): an iterative, weighted
graph algorithm expressed as plain join+aggregate rounds. Nodes are
nations, directed edges are (customer nation -> supplier nation) with
line-item counts as weights — the q5/q7 trade topology re-used as a
graph.

Determinism across engines is the interesting part: float PageRank
sums are addition-order-sensitive, so both sides run the SAME integer
arithmetic — ranks in micro-units, per-edge contributions truncated
with integer division, damping applied as (850 * x) DIV 1000. Sums of
integers are order-free, so three full iterations hash-match exactly,
not approximately.

Scale shape: the edge list aggregates once (map-side combined) and is
tiny (|nations|²) — each iteration is a broadcast join of ranks to
edges plus one aggregate. For a billion-node graph the same loop
shape holds with ranks/edges both distributed and AQE handling the
skewed high-degree joins; iteration count stays a driver-side loop.

Reference analog: none (305-LoC CDC parser); extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log2sql_spark.registry import query
from log2sql_spark.sources.tables import load_table

_ITERS = 3
_R0 = 1_000_000  # initial rank in micro-units


def _edges_sql() -> str:
    return """
    WITH edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ), outw AS (
      SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM edges GROUP BY src
    ), nodes AS (
      SELECT n_nationkey AS node, n_name FROM nation
    )"""


def _iter_sql(prev: str, cur: str) -> str:
    return f"""
    , {cur} AS (
      SELECT n.node,
             150000 + (850 * coalesce(c.contrib, 0)) // 1000 AS r
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node,
               CAST(sum((p.r * e.w) // o.wout) AS BIGINT) AS contrib
        FROM edges e
        JOIN {prev} p ON p.node = e.src
        JOIN outw o ON o.src = e.src
        GROUP BY e.dst
      ) c ON c.node = n.node
    )"""


@query(
    "graph_pagerank_trade",
    oracle=_edges_sql()
    + f"""
    , it0 AS (SELECT node, CAST({_R0} AS BIGINT) AS r FROM nodes)
    {"".join(_iter_sql(f"it{i}", f"it{i + 1}") for i in range(_ITERS))}
    SELECT n.n_name AS nation, CAST(p.r AS BIGINT) AS rank_micro
    FROM it{_ITERS} p JOIN nodes n ON n.node = p.node
    ORDER BY rank_micro DESC, nation
    """,
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three PageRank iterations (damping 0.85) over the nation trade
    graph, in exact integer arithmetic — see module docstring. The
    driver loop only composes the plan; each round is one broadcast
    join of the 25-row rank table to the persisted edge list plus one
    integer aggregate."""
    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)

    edges = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").cast("long").alias("wout"))
    # Materialize the weighted edge list ONCE before iterating — the
    # lineage barrier every iterative Spark job needs (GraphX/checkpoint
    # pattern): without it each iteration's plan re-derives the 4-table
    # edge build, and failure recovery recomputes from the raw scans.
    import os

    from log2sql_spark.scratch import scratch_dir

    ew_path = os.path.join(scratch_dir("log2sql_pagerank_"), "edges")
    edges.join(outw, "src").write.mode("overwrite").parquet(ew_path)
    ew = spark.read.parquet(ew_path)
    nodes = nation.select(F.col("n_nationkey").alias("node"), "n_name")

    ranks = nodes.select("node", F.lit(_R0).cast("long").alias("r"))
    for _ in range(_ITERS):
        contrib = (
            ew.join(F.broadcast(ranks), ew.src == ranks.node)
            .select("dst", F.expr("(r * w) div wout").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("contrib"))
        )
        ranks = nodes.join(
            contrib, nodes.node == contrib.dst, "left"
        ).select(
            "node",
            (
                F.lit(150_000)
                + F.expr("(850 * coalesce(contrib, 0)) div 1000")
            ).cast("long").alias("r"),
        )
    return (
        ranks.join(nodes, "node")
        .select(F.col("n_name").alias("nation"), F.col("r").alias("rank_micro"))
        .orderBy(F.desc("rank_micro"), F.asc("nation"))
    )


@query(
    "graph_bfs_trade_distances",
    oracle="""
    WITH raw AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT src, dst,
             row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
      FROM raw
    ), edges AS (
      SELECT src, dst FROM ranked WHERE rn <= 3
    ), walk AS (
      WITH RECURSIVE walk(node, d) AS (
        SELECT CAST(0 AS BIGINT), 0
        UNION
        SELECT CAST(e.dst AS BIGINT), w.d + 1
        FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.d < 6
      )
      SELECT * FROM walk
    )
    SELECT n.n_name AS nation, CAST(min(w.d) AS INTEGER) AS hops
    FROM walk w JOIN nation n ON n.n_nationkey = w.node
    GROUP BY n.n_name
    ORDER BY hops, nation
    """,
)
def graph_bfs_trade_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distances from nation 0 over the SPARSIFIED trade graph
    (each nation keeps its top-3 trade destinations, deterministic
    (weight desc, dst) tie-break — the dense graph is diameter 1 and
    says nothing). Reachability/centrality complement to the PageRank
    query: the frontier loop is K broadcast joins of a ≤25-row distance
    table against the 75-row edge list, so iteration cost is driven by
    the one-time edge derivation (the same 4-table join PageRank
    materializes); the oracle walks the identical graph with a
    recursive CTE and takes min hop count per nation. Unreached
    nations are absent from both sides."""
    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)

    from pyspark.sql import Window as W

    raw = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    wr = W.partitionBy("src").orderBy(F.desc("w"), F.asc("dst"))
    edges = (
        raw.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 3)
        .select("src", "dst")
    )
    # tiny graph: collect-free iteration, but persist the edge list so
    # the 4-table build runs once, not once per hop
    edges = edges.persist()
    from log2sql_spark.localrel import values_df

    dist = values_df(spark, [(0, 0)], "node bigint, d int")
    for k in range(1, 7):
        frontier = (
            edges.join(F.broadcast(dist), edges.src == dist.node)
            .select(F.col("dst").cast("bigint").alias("node"), F.lit(k).alias("d"))
        )
        dist = dist.unionByName(frontier).groupBy("node").agg(
            F.min("d").cast("int").alias("d")
        )
        # truncate lineage each hop: the distance table is <=25 rows but
        # its un-checkpointed plan doubles per iteration (re-analysis
        # cost, not data cost — 24s of pure planning at 6 hops without
        # this); eager localCheckpoint keeps the loop linear.
        dist = dist.localCheckpoint(eager=True)
    return (
        dist.join(
            nation.select(F.col("n_nationkey").cast("bigint").alias("node"), "n_name"),
            "node",
        )
        .select(F.col("n_name").alias("nation"), F.col("d").cast("int").alias("hops"))
        .orderBy("hops", "nation")
    )


@query(
    "graph_triangle_count",
    oracle="""
    WITH raw AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT src, dst,
             row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
      FROM raw WHERE src <> dst
    ), und AS (
      SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      FROM ranked WHERE rn <= 3
    ), tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM und e1
      JOIN und e2 ON e2.u = e1.v
      JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS triangles
    FROM (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ) t
    JOIN nation n ON n.n_nationkey = t.node
    GROUP BY n.n_name
    ORDER BY triangles DESC, nation
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the sparsified trade graph — the
    clustering/community complement to the PageRank (influence) and
    BFS (reachability) queries. Same top-3-destinations sparsification
    and (weight desc, dst) tie-break as graph_bfs_trade_distances; the
    dense graph is a near-clique whose triangle counts say nothing.

    Shape is the textbook distributed triangle enumeration: edges are
    canonicalized to u < v, so each triangle a < b < c is generated
    exactly once by the wedge join (a,b)x(b,c) and confirmed by one
    semi-join against (a,c) — no factor-6 overcount to divide away,
    and the orientation halves the wedge fan-out. At a billion edges
    the same plan holds with the orientation done by (degree, id)
    instead of raw id — the standard high-degree-vertex mitigation —
    and the wedge join shuffling on the mid vertex; here the ≤75-row
    edge list broadcasts, so triangle counting costs one map-side
    stage on top of the shared 4-table edge derivation.

    Reference analog: none (LLM/graph extension, SURVEY.md §2.2).
    """
    from pyspark.sql import Window as W

    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)

    raw = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .filter(F.col("src") != F.col("dst"))
    )
    wr = W.partitionBy("src").orderBy(F.desc("w"), F.asc("dst"))
    und = (
        raw.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 3)
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
        # eager checkpoint, not persist: the ≤75-row edge list feeds
        # THREE self-join arms — checkpointing collapses the repeated
        # 4-table build out of the plan entirely (same lineage-barrier
        # reasoning as the BFS frontier loop above).
        .localCheckpoint(eager=True)
    )
    e1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = und.select(F.col("u").alias("b"), F.col("v").alias("c"))
    wedges = e1.join(F.broadcast(e2), "b")
    tri = wedges.join(
        F.broadcast(und),
        (wedges.a == und.u) & (wedges.c == und.v),
        "left_semi",
    )
    members = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
    )
    return (
        members.join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("node"), "n_name")),
            "node",
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
        .orderBy(F.desc("triangles"), F.asc("nation"))
    )


@query(
    "graph_jaccard_link_prediction",
    oracle="""
    WITH raw AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT src, dst,
             row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
      FROM raw WHERE src <> dst
    ), und AS (
      SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      FROM ranked WHERE rn <= 3
    ), adj AS (
      SELECT u AS node, v AS nbr FROM und
      UNION ALL SELECT v AS node, u AS nbr FROM und
    ), deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY node
    ), cn AS (
      SELECT a.node AS u, b.node AS v, CAST(count(*) AS BIGINT) AS common
      FROM adj a JOIN adj b ON a.nbr = b.nbr AND a.node < b.node
      GROUP BY a.node, b.node
    ), nonedge AS (
      SELECT cn.* FROM cn
      LEFT JOIN und e ON e.u = cn.u AND e.v = cn.v
      WHERE e.u IS NULL
    )
    SELECT n.u, n.v, n.common,
           CAST(n.common * 10000 // (du.d + dv.d - n.common) AS BIGINT)
             AS jaccard_bp
    FROM nonedge n
      JOIN deg du ON du.node = n.u
      JOIN deg dv ON dv.node = n.v
    ORDER BY jaccard_bp DESC, n.u, n.v
    """,
)
def graph_jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard-coefficient link prediction over the sparsified trade
    graph (Liben-Nowell & Kleinberg, CIKM 2003): for every NON-adjacent
    pair with at least one common neighbor, |N(u)∩N(v)| / |N(u)∪N(v)|
    in truncating basis points — which missing trade edges the topology
    most implies, completing the graph quartet (PageRank = influence,
    BFS = reachability, triangles = clustering, this = prediction).
    Same top-3 sparsification and tie-breaks as its siblings, and the
    same shared-edge-derivation economics: one checkpointed edge list
    feeds the adjacency self-join, so common-neighbor counting is ONE
    wedge join shuffling on the mid vertex + a degree broadcast —
    exactly the triangle plan minus the closing semi-join (a wedge
    whose endpoints close is a triangle; one that doesn't is a
    prediction candidate). At a billion edges the wedge join shuffles
    on nbr and the high-degree mitigation is the same (degree, id)
    orientation trick. Reference analog: none — graph extension
    (SURVEY.md §2.2)."""
    from pyspark.sql import Window as W

    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)

    raw = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .filter(F.col("src") != F.col("dst"))
    )
    wr = W.partitionBy("src").orderBy(F.desc("w"), F.asc("dst"))
    und = (
        raw.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 3)
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)  # shared lineage barrier, as siblings
    )
    adj = und.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionByName(
        und.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("d"))
    a, b = adj.alias("a"), adj.alias("b")
    cn = (
        a.join(
            F.broadcast(b),
            (F.col("a.nbr") == F.col("b.nbr")) & (F.col("a.node") < F.col("b.node")),
        )
        .groupBy(F.col("a.node").alias("u"), F.col("b.node").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    nonedge = cn.join(und, ["u", "v"], "left_anti")
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    return (
        nonedge.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            "u",
            "v",
            "common",
            F.expr("CAST(common * 10000 DIV (du + dv - common) AS BIGINT)").alias(
                "jaccard_bp"
            ),
        )
        .orderBy(F.desc("jaccard_bp"), "u", "v")
    )


@query(
    "graph_connected_components",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_quantity = 50 AND l.l_discount >= 0.09
    ), edges AS (
      SELECT c AS src, s + 1000000 AS dst FROM e
      UNION ALL
      SELECT s + 1000000 AS src, c AS dst FROM e
    ), nodes AS (
      SELECT DISTINCT src AS node FROM edges
    ), reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT edges.dst, reach.r FROM reach JOIN edges ON edges.src = reach.node
    ), comp AS (
      SELECT node, CAST(min(r) AS BIGINT) AS comp FROM reach GROUP BY node
    ), sized AS (
      SELECT comp AS comp2, CAST(count(*) AS BIGINT) AS comp_size
      FROM comp GROUP BY comp
    )
    SELECT CAST(CASE WHEN node >= 1000000 THEN node - 1000000 ELSE node END
                AS BIGINT) AS entity_key,
           CASE WHEN node >= 1000000 THEN 'supplier' ELSE 'customer' END
             AS entity_type,
           comp, comp_size
    FROM comp JOIN sized ON comp = comp2
    ORDER BY comp, entity_type, entity_key
    """,
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the rare-purchase customer-supplier
    bipartite graph (max-quantity, deep-discount line items — sparse
    enough that real multi-hop components emerge: ~68 components at
    sf0.01, largest 13 nodes, instead of one giant hub-connected blob).
    Completes the graph family: influence (PageRank), reachability
    (BFS), clustering (triangles), prediction (Jaccard), COMPONENTS —
    the primitive behind entity resolution and dedup clustering
    (operators/dedup.py::dedup_clusters shares the same loop shape over
    LSH candidate edges).

    Algorithm: min-label propagation WITH pointer jumping. Each round
    is (a) one shuffle join pulling neighbors' labels + a min-aggregate,
    then (b) a label-doubling step (labels ⋈ labels on label = node)
    that replaces every label by its label's label — the Shiloach-Vishkin
    shortcut that makes rounds O(log diameter) instead of O(diameter)
    (plain propagation measured 13.5 s over 9+ rounds at sf1; doubling
    runs 4). Labels are monotonically non-increasing bigints, so
    convergence is detected by an order-free integer sum the driver
    compares between rounds (no row-wise diff join). Lineage is
    truncated per round with an eager localCheckpoint — the BFS/PageRank
    lesson: an un-checkpointed iterative plan doubles per round and the
    cost is re-analysis, not data. At 100 TB the same loop shape holds
    with both joins shuffling on their keys (Kiveris et al.
    large-star/small-star is this plan with a degree-aware orientation).

    The node id space disambiguates the bipartite sides by offsetting
    suppliers +1e6; component ids are the minimum member id, so the
    labeling is unique regardless of execution order — the DuckDB
    oracle derives it independently via a recursive CTE and every
    (entity, component, size) row must agree.

    Reference analog: none (305-LoC CDC parser); extension surface.
    """
    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)

    # the rare-purchase filter keeps ~0.4% of lineitem, so the filtered
    # side broadcasts and orders streams through a hash join instead of
    # both sides shuffling on orderkey (6.3 s -> 0.9 s warm at sf1)
    flt = lineitem.filter(
        (F.col("l_quantity") == 50) & (F.col("l_discount") >= 0.09)
    ).select(
        F.col("l_orderkey").alias("lo"), F.col("l_suppkey").cast("bigint").alias("s")
    )
    e = (
        F.broadcast(flt)
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("lo") == F.col("o_orderkey"),
        )
        .select(F.col("o_custkey").cast("bigint").alias("c"), F.col("s"))
        .distinct()
    )
    from log2sql_spark.operators.graph import connected_components

    labels = connected_components(
        e.select(F.col("c").alias("src"), (F.col("s") + 1000000).alias("dst"))
    )
    sized = labels.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("comp_size"))
    return (
        labels.join(sized, "label")
        .select(
            F.when(F.col("node") >= 1000000, F.col("node") - 1000000)
            .otherwise(F.col("node"))
            .cast("bigint")
            .alias("entity_key"),
            F.when(F.col("node") >= 1000000, F.lit("supplier"))
            .otherwise(F.lit("customer"))
            .alias("entity_type"),
            F.col("label").cast("bigint").alias("comp"),
            "comp_size",
        )
        .orderBy("comp", "entity_type", "entity_key")
    )


@query(
    "graph_closeness_centrality",
    oracle="""
    WITH RECURSIVE raw AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT src, dst,
             row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
      FROM raw WHERE src <> dst
    ), und AS (
      SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      FROM ranked WHERE rn <= 3
    ), edges AS (
      SELECT u AS a, v AS b FROM und UNION ALL SELECT v, u FROM und
    ), walk(src, node, d) AS (
      SELECT a, a, 0 FROM (SELECT DISTINCT a FROM edges)
      UNION
      SELECT walk.src, edges.b, walk.d + 1
      FROM walk JOIN edges ON edges.a = walk.node
      WHERE walk.d < 6
    ), dist AS (
      SELECT src, node, CAST(min(d) AS BIGINT) AS d
      FROM walk GROUP BY src, node
    )
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_reached,
           CAST(sum(d) AS BIGINT) AS sum_dist,
           CAST(count(*) * 10000 // sum(d) AS BIGINT)
             AS closeness_bp
    FROM dist JOIN nation n ON n.n_nationkey = dist.src
    WHERE dist.node <> dist.src
    GROUP BY n.n_name
    HAVING sum(d) > 0
    ORDER BY closeness_bp DESC, nation
    """,
)
def graph_closeness_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closeness centrality over the top-3-sparsified trade graph —
    the all-sources member of the centrality family (PageRank =
    influence, BFS = single-source reachability, triangles =
    clustering, components = connectivity): closeness(v) =
    (reached−1)/Σdist, reported as integer basis points via truncating
    division so both engines agree exactly. MULTI-source BFS in ONE
    frontier loop: the distance frontier carries (source, node) pairs,
    so the same K broadcast-join hops that computed one source's
    distances compute all |V| of them — at scale this is the textbook
    trick that turns |V| sequential BFS runs into one loop over a
    |V|×frontier relation (Pregel's message batching restated as
    joins). The oracle walks the identical graph with a recursive CTE
    and takes min hops per (source, node)."""
    from pyspark.sql import Window as W

    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)

    raw = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    wr = W.partitionBy("src").orderBy(F.desc("w"), F.asc("dst"))
    und = (
        raw.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 3)
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    edges = (
        und.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionByName(und.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .localCheckpoint(eager=True)  # derive the 4-table join once
    )
    dist = edges.select(F.col("a").alias("src")).distinct().select(
        "src", F.col("src").alias("node"), F.lit(0).alias("d")
    )
    for k in range(1, 7):
        frontier = (
            edges.join(
                F.broadcast(dist), edges.a == dist.node
            )  # dist is <=625 rows: nations x nations
            .select("src", F.col("b").alias("node"), F.lit(k).alias("d"))
        )
        dist = (
            dist.unionByName(frontier)
            .groupBy("src", "node")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=True)  # linear lineage, the BFS lesson
        )
    return (
        dist.filter(F.col("node") != F.col("src"))
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_reached"),
            F.sum("d").cast("long").alias("sum_dist"),
        )
        .filter(F.col("sum_dist") > 0)
        .join(
            F.broadcast(
                nation.select(F.col("n_nationkey").alias("src"), "n_name")
            ),
            "src",
        )
        .select(
            F.col("n_name").alias("nation"),
            "n_reached",
            "sum_dist",
            F.expr("n_reached * 10000 DIV sum_dist").cast("bigint").alias(
                "closeness_bp"
            ),
        )
        .orderBy(F.desc("closeness_bp"), "nation")
    )


@query(
    "graph_degree_assortativity",
    oracle="""
    WITH raw AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT src, dst,
             row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
      FROM raw WHERE src <> dst
    ), und AS (
      SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      FROM ranked WHERE rn <= 3
    ), deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM und UNION ALL SELECT v FROM und
      ) ends GROUP BY node
    ), both_dirs AS (
      SELECT du.d AS x, dv.d AS y
      FROM und e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
      UNION ALL
      SELECT dv.d AS x, du.d AS y
      FROM und e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
    )
    SELECT CAST(count(*) AS BIGINT) AS m2,
           CAST(sum(x * y) AS BIGINT) AS sum_xy,
           CAST(sum(x) AS BIGINT) AS sum_x,
           CAST(sum(x * x) AS BIGINT) AS sum_x2
    FROM both_dirs
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the sparsified trade graph — Newman's
    r = (m⁻¹Σxy − (m⁻¹Σ(x+y)/2)²) / (m⁻¹Σ(x²+y²)/2 − (...)²) over edge
    endpoint degrees, emitted as its EXACT integer sufficient
    statistics (both edge orientations, so Σx = Σy and one x-moment
    set suffices): the Pearson numerator/denominator reconstruct
    exactly, no cross-engine float hashing. Assortativity tells you
    whether hubs trade with hubs (r>0) or hubs with spokes (r<0) —
    the skew-planning signal for graph partitioning. Shape: degree
    count over the edge ends, one broadcast join back onto edges,
    one scalar aggregate — at a billion edges the degree table
    shuffles on node and the moment aggregate stays map-side."""
    from pyspark.sql import Window as W

    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)

    raw = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .filter(F.col("src") != F.col("dst"))
    )
    wr = W.partitionBy("src").orderBy(F.desc("w"), F.asc("dst"))
    und = (
        raw.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 3)
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)  # feeds degree AND the edge join
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    joined = und.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    both = joined.select(
        F.col("du").alias("x"), F.col("dv").alias("y")
    ).unionByName(
        joined.select(F.col("dv").alias("x"), F.col("du").alias("y"))
    )
    return both.agg(
        F.count(F.lit(1)).alias("m2"),
        F.sum(F.col("x") * F.col("y")).alias("sum_xy"),
        F.sum("x").alias("sum_x"),
        F.sum(F.col("x") * F.col("x")).alias("sum_x2"),
    )


_KCORE_ROUNDS = 14  # peeling converges in 8 rounds at sf0.01; margin on top


def _kcore_round_sql(prev: str, cur: str) -> str:
    # survivors = nodes of `prev` with >= 2 surviving neighbors; a
    # no-op once converged, so extra unrolled rounds are harmless
    return f"""
    , {cur} AS MATERIALIZED (
      SELECT a.node FROM {prev} a
      JOIN und ON und.u = a.node
      JOIN {prev} b ON b.node = und.v
      GROUP BY a.node HAVING count(*) >= 2
    )"""


@query(
    "graph_kcore_decomposition",
    oracle="""
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey + 1000000 AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_quantity >= 49 AND l.l_discount >= 0.08
    ), und AS MATERIALIZED (
      SELECT c AS u, s AS v FROM e0
      UNION ALL
      SELECT s AS u, c AS v FROM e0
    ), r0 AS (SELECT DISTINCT u AS node FROM und)
    """
    + "".join(
        _kcore_round_sql(f"r{i}", f"r{i + 1}") for i in range(_KCORE_ROUNDS)
    )
    + f"""
    SELECT CAST(CASE WHEN a.node >= 1000000 THEN a.node - 1000000
                     ELSE a.node END AS BIGINT) AS entity_key,
           CASE WHEN a.node >= 1000000 THEN 'supplier'
                ELSE 'customer' END AS entity_type,
           CAST(count(*) AS BIGINT) AS core_degree
    FROM r{_KCORE_ROUNDS} a
    JOIN und ON und.u = a.node
    JOIN r{_KCORE_ROUNDS} b ON b.node = und.v
    GROUP BY a.node
    ORDER BY entity_type, entity_key
    """,
)
def graph_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the high-quantity deep-discount customer–supplier
    bipartite graph: peel away every node with fewer than 2 surviving
    neighbors until stable (8 cascading rounds at sf0.01 — removing a
    leaf strips its neighbor down to a leaf, and so on), leaving the
    cyclic nucleus (104 of ~700 nodes). The k-core is the fraud-ring /
    community-nucleus primitive: tree-like periphery — which dominates
    real activity graphs — can never fake its way in, because
    membership requires k *mutually surviving* neighbors.

    Spark side is a true fixed-point loop (operators/graph.py::kcore):
    per round one shuffle join of the shrinking survivor set against
    the static symmetrized edge list + a count aggregate, lineage
    truncated per round, convergence detected by the survivor COUNT
    (monotone, order-free). The DuckDB oracle unrolls 14 parallel-peel
    rounds (idempotent once converged) and must agree on every
    (entity, core_degree) row.

    Reference analog: none (305-LoC CDC parser); extension surface
    alongside components/PageRank/BFS/triangles/assortativity.
    """
    from log2sql_spark.operators.graph import kcore

    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    flt = lineitem.filter(
        (F.col("l_quantity") >= 49) & (F.col("l_discount") >= 0.08)
    ).select(
        F.col("l_orderkey").alias("lo"),
        (F.col("l_suppkey").cast("bigint") + 1000000).alias("s"),
    )
    e = (
        F.broadcast(flt)
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("lo") == F.col("o_orderkey"),
        )
        .select(F.col("o_custkey").cast("bigint").alias("src"), F.col("s").alias("dst"))
        .distinct()
    )
    # Cap the Spark peel at the oracle's unroll depth: if a dataset
    # ever needed more rounds, kcore RAISES (r12) instead of passing
    # Spark-side while silently diverging from the 14-round oracle.
    core = kcore(e, k=2, max_rounds=_KCORE_ROUNDS)
    return (
        core.select(
            F.when(F.col("node") >= 1000000, F.col("node") - 1000000)
            .otherwise(F.col("node"))
            .cast("bigint")
            .alias("entity_key"),
            F.when(F.col("node") >= 1000000, F.lit("supplier"))
            .otherwise(F.lit("customer"))
            .alias("entity_type"),
            F.col("core_degree").cast("long").alias("core_degree"),
        )
        .orderBy("entity_type", "entity_key")
    )
