"""Directed-graph kernels: reachability, multi-source reachability, SCC.

Completes the reference's four-kernel suite (BFS/SSSP live in
``kernels``; BCC is documented out-of-scope in SURVEY.md §2D):

- ``reachability``       — boolean BFS over out-edges (reference
                           src/SCC/reach.h:16-130, minus distances).
- ``multi_reachability`` — label-set propagation: a frontier of
                           (vertex, source_label) pairs, deduped per
                           superstep; the reference's concurrent hash table
                           (src/SCC/multi_reach.h:21-139) *is* Spark's
                           shuffle dedup.
- ``scc``                — forward/backward min-label coloring: the
                           deterministic DataFrame rendition of BGSS-style
                           SCC (src/SCC/scc.h:17-203). Each phase colors
                           vertices by the min root reaching them forward,
                           then claims the SCC of each root by backward
                           reachability inside the color; settled vertices
                           leave the working set (the reference's ``trim``
                           + settled-bit idiom, src/SCC/scc.h:26-27,39-49).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pasgal_spark.graph.kernels import _StateChain


def reachability(edges: DataFrame, source: int = 0, *, max_iterations: int = 100) -> DataFrame:
    """(id) reachable from ``source`` over directed edges (incl. source)."""
    spark = edges.sparkSession
    visited = spark.createDataFrame([(source,)], "id long").localCheckpoint(eager=True)
    frontier = visited
    for _ in range(max_iterations):
        nxt = (
            edges.join(frontier, edges.src == frontier.id)
            .select(edges.dst.alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def multi_reachability(
    edges: DataFrame, sources: list[int], *, max_iterations: int = 100
) -> DataFrame:
    """(id, source): which of ``sources`` reaches each vertex.

    Propagates (vertex, label) pairs; `distinct()` per superstep is the
    shuffle-native replacement for the reference's resizable concurrent
    multimap (src/SCC/resizable_table.h:40-173).
    """
    spark = edges.sparkSession
    visited = spark.createDataFrame(
        [(s, s) for s in sources], "id long, source long"
    ).localCheckpoint(eager=True)
    frontier = visited
    for _ in range(max_iterations):
        nxt = (
            edges.join(frontier, edges.src == frontier.id)
            .select(edges.dst.alias("id"), "source")
            .distinct()
            .join(visited, ["id", "source"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def _min_label_to_fixpoint(
    edges: DataFrame, labels: DataFrame, *, max_iterations: int = 200
) -> DataFrame:
    """Propagate min label along directed edges until fixpoint.

    labels: (id, lbl) — every vertex present. Returns same shape.
    The label-sum is a strictly decreasing potential (cheap convergence
    test, same trick as kernels.connected_components).
    """
    prev_sum = None
    for it in range(max_iterations):
        msgs = (
            edges.join(labels, edges.src == labels.id)
            .select(edges.dst.alias("id"), "lbl")
        )
        new = (
            labels.unionByName(msgs).groupBy("id").agg(F.min("lbl").alias("lbl"))
        ).localCheckpoint(eager=True)
        s = new.agg(F.sum("lbl")).first()[0]
        converged = it > 0 and s == prev_sum
        prev_sum = s
        labels = new
        if converged:
            break
    return labels


def scc(
    edges: DataFrame,
    vertices: DataFrame,
    *,
    max_phases: int = 50,
) -> DataFrame:
    """(id, scc): strongly connected components, scc = min member id.

    Coloring algorithm (deterministic): per phase, (1) forward-propagate
    min vertex id to fixpoint → color(v); (2) a vertex whose color equals
    its own id is a root; (3) backward-propagate root ids along edges
    *within the same color* — vertices reached share a cycle with the root
    through color-internal paths, so they form the root's SCC; (4) settle
    them, shrink the working graph, repeat. Trivial SCCs settle in the
    phase their vertex becomes a root.
    """
    settled = None  # (id, scc)
    work_edges = edges.localCheckpoint(eager=True)
    work_vertices = vertices.select("id").localCheckpoint(eager=True)

    for _ in range(max_phases):
        if work_vertices.isEmpty():
            break
        # (1) forward min-label coloring
        colors = _min_label_to_fixpoint(
            work_edges, work_vertices.select("id", work_vertices.id.alias("lbl"))
        ).withColumnRenamed("lbl", "color")

        # (2+3) backward reach of roots inside their color: reverse edges,
        # keep only edges whose endpoints share a color.
        ec = (
            work_edges.join(colors.withColumnRenamed("id", "src"), "src")
            .withColumnRenamed("color", "c_src")
            .join(
                colors.select(F.col("id").alias("dst"), F.col("color").alias("c_dst")),
                "dst",
            )
            .filter("c_src = c_dst")
            .select(F.col("dst").alias("src"), F.col("src").alias("dst"))  # reversed
            .localCheckpoint(eager=True)
        )
        roots = colors.filter("id = color").select(
            "id", F.col("id").alias("source")
        )
        # backward frontier propagation from all roots at once
        visited = roots.localCheckpoint(eager=True)
        frontier = visited
        while True:
            nxt = (
                ec.join(frontier, ec.src == frontier.id)
                .select(ec.dst.alias("id"), "source")
                .distinct()
                .join(visited, ["id", "source"], "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            visited = visited.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
        # a vertex can only be backward-reached by its own color's root
        # (edges are color-internal and sources are the color roots)
        newly = visited.withColumnRenamed("source", "scc")
        if newly.isEmpty():  # defensive: every phase settles >= the roots
            break

        settled = (
            newly if settled is None else settled.unionByName(newly)
        ).localCheckpoint(eager=True)

        work_vertices = work_vertices.join(newly, "id", "left_anti").localCheckpoint(
            eager=True
        )
        work_edges = (
            work_edges.join(newly.select(F.col("id").alias("src")), "src", "left_anti")
            .join(newly.select(F.col("id").alias("dst")), "dst", "left_anti")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    if settled is None:
        return vertices.sparkSession.createDataFrame([], "id long, scc long")
    return settled.select("id", "scc")


def spanning_forest(sym: DataFrame, vertices: DataFrame, cc: DataFrame) -> DataFrame:
    """(child, parent, component): a spanning forest of the symmetric graph.

    Multi-source BFS from each component's minimum vertex (the canonical
    root); parent(v) = min same-depth-1 neighbor — deterministic, unlike
    the reference's CAS-race parents (src/BCC/spanning_forest.h:5-60).
    Tree edges per component = size - 1 (validated in tests).
    """
    spark = sym.sparkSession
    roots = cc.select(F.col("component").alias("id")).distinct()
    visited = roots.withColumn("dist", F.lit(0)).localCheckpoint(eager=True)
    frontier = visited
    parents = None
    d = 0
    while True:
        d += 1
        cand = (
            sym.join(frontier, sym.src == frontier.id)
            .select(sym.dst.alias("id"), sym.src.alias("parent"))
            .join(visited.select("id"), "id", "left_anti")
        )
        nxt_parents = (
            cand.groupBy("id").agg(F.min("parent").alias("parent"))
        ).localCheckpoint(eager=True)
        if nxt_parents.isEmpty():
            break
        parents = (
            nxt_parents if parents is None else parents.unionByName(nxt_parents)
        ).localCheckpoint(eager=True)
        nxt = nxt_parents.select("id").withColumn("dist", F.lit(d))
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    if parents is None:
        return spark.createDataFrame([], "child long, parent long, component long")
    return (
        parents.withColumnRenamed("id", "child")
        .join(cc.withColumnRenamed("id", "child"), "child")
        .select("child", "parent", "component")
    )
