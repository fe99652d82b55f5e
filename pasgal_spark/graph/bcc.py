"""FAST-BCC: biconnected components as DataFrame supersteps.

Spark-native re-expression of the reference's FAST-BCC
(/root/reference/src/BCC/fast-bcc.h:14-283; the BFS skeleton and fence
idea follow the published algorithm that file implements):

1. **Spanning tree per component** (BFS forest with deterministic min
   parents) — fast-bcc.h:227.
2. **Interval tagging** ``first``/``last`` — the reference computes Euler
   tour positions via parallel list ranking (fast-bcc.h:32-148).  The
   positions are only ever consumed through the interval-containment
   property (``u in subtree(v)  <=>  first[v] <= first[u] and
   last[u] <= last[v]``, see the ``critical``/``backward`` predicates at
   fast-bcc.h:230-237), so the Spark plan computes an equivalent
   *preorder numbering from subtree sizes*: one bottom-up and one
   top-down pass of O(tree depth) level supersteps, each a small
   join+aggregate, instead of an O(m)-row list-ranking shuffle chain.
   On web graphs (BFS) tree depth ~ graph diameter, which is small;
   each level superstep touches only two adjacent BFS levels.
3. **low/high tags** = subtree min/max of the non-tree-edge endpoint
   firsts (fast-bcc.h:177-202) — the sparse-table range query over Euler
   positions becomes the same bottom-up level aggregation (a subtree IS
   an Euler/preorder interval).
4. **Fence predicate** filters the edge table (fast-bcc.h:239-254):
   tree edges survive unless *critical* (child subtree has no escape
   above/past the parent interval); non-tree edges survive unless
   *backward* (ancestor-descendant).
5. **Connectivity on the filtered graph** (fast-bcc.h:256) labels each
   vertex with its BCC cluster; a biconnected component = cluster + its
   head (the parent of the cluster's shallowest vertex,
   fast-bcc.h:205-214), so the per-EDGE component is the cluster label
   of the edge's *deeper* endpoint.

Scale notes: every superstep joins the static (cached) edge table against
small per-level state; the only full-edge-table passes are the non-tree
tagging aggregate and the fence filter (one scan each).  No driver-side
loops over data, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pasgal_spark.graph.kernels import connected_components_two_phase


def spanning_tree(
    sym: DataFrame, vertices: DataFrame, cc: DataFrame, *, max_depth: int = 200
) -> DataFrame:
    """(id, parent, depth, component): BFS tree of each component.

    Roots are the canonical component labels (min vertex id), with
    ``parent = id`` and ``depth = 0``; parent(v) = min neighbor at
    depth-1 (deterministic, replacing the reference's CAS-race parents,
    src/BCC/spanning_forest.h:5-60).
    """
    roots = (
        cc.select(F.col("component").alias("id")).distinct()
        .select("id", F.col("id").alias("parent"), F.lit(0).alias("depth"))
        .localCheckpoint(eager=True)
    )
    visited = roots
    frontier = roots
    d = 0
    while d < max_depth:
        d += 1
        cand = (
            sym.join(frontier, sym.src == frontier.id)
            .select(sym.dst.alias("id"), sym.src.alias("parent"))
            .join(visited.select("id"), "id", "left_anti")
        )
        nxt = (
            cand.groupBy("id")
            .agg(F.min("parent").alias("parent"))
            .withColumn("depth", F.lit(d))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited.join(cc, "id").select("id", "parent", "depth", "component")


def _bottom_up(
    init: DataFrame,
    agg_cols: list[tuple[str, str]],
    max_depth: int,
) -> DataFrame:
    """Generic O(depth) bottom-up tree aggregation.

    ``init``: (id, parent, depth, <cols...>) leaf-to-root values; for each
    (col, how) in ``agg_cols`` (how in min/max/sum) the result carries
    col' = how(col, how over children's aggregated col).  Returns
    (id, parent, depth, <cols...>) with subtree-aggregated values.
    """
    fns = {"min": (F.min, F.least), "max": (F.max, F.greatest), "sum": (F.sum, None)}
    init = init.select("id", "parent", "depth", *[c for c, _ in agg_cols])
    cur = init.filter(F.col("depth") == max_depth).localCheckpoint(eager=True)
    done = [cur]
    for d in range(max_depth - 1, -1, -1):
        contrib = cur.groupBy("parent").agg(
            *[fns[how][0](c).alias(f"_c_{c}") for c, how in agg_cols]
        ).withColumnRenamed("parent", "id")
        lvl = init.filter(F.col("depth") == d).join(contrib, "id", "left")
        outs = []
        for c, how in agg_cols:
            child = F.col(f"_c_{c}")
            if how == "sum":
                outs.append((F.col(c) + F.coalesce(child, F.lit(0))).alias(c))
            else:
                outs.append(fns[how][1](F.col(c), F.coalesce(child, F.col(c))).alias(c))
        lvl = lvl.select("id", "parent", "depth", *outs).localCheckpoint(eager=True)
        done.append(lvl)
        cur = lvl
    out = done[0]
    for df in done[1:]:
        out = out.unionByName(df)
    return out


def tree_tags(tree: DataFrame, sym: DataFrame) -> DataFrame:
    """(id, parent, depth, first, last, low, high): FAST-BCC vertex tags.

    ``first``/``last`` form a preorder interval labeling per tree (the
    declarative stand-in for Euler tour positions, see module docstring);
    ``low``/``high`` are the subtree min/max of non-tree-edge endpoint
    firsts (fast-bcc.h:177-202).
    """
    max_depth = tree.agg(F.max("depth")).first()[0] or 0

    # -- subtree sizes (bottom-up) ---------------------------------------
    init = tree.withColumn("size", F.lit(1).cast("long"))
    sizes = _bottom_up(init, [("size", "sum")], max_depth)

    # -- preorder first (top-down): first[c] = first[p] + 1 + sum of sizes
    #    of siblings ordered (by id) before c ----------------------------
    w = (
        Window.partitionBy("parent")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kids = (
        sizes.filter(F.col("depth") > 0)
        .withColumn("presum", F.sum("size").over(w) - F.col("size"))
        .localCheckpoint(eager=True)
    )
    first = (
        tree.filter(F.col("depth") == 0)
        .select("id", F.lit(0).cast("long").alias("first"))
        .localCheckpoint(eager=True)
    )
    cur = first
    for d in range(1, max_depth + 1):
        lvl = (
            kids.filter(F.col("depth") == d)
            .join(cur.select(F.col("id").alias("parent"), F.col("first").alias("pf")), "parent")
            .select(
                "id", (F.col("pf") + 1 + F.col("presum")).alias("first")
            )
            .localCheckpoint(eager=True)
        )
        first = first.unionByName(lvl)
        cur = lvl
    first = first.localCheckpoint(eager=True)

    fl = (
        tree.join(first, "id")
        .join(sizes.select("id", "size"), "id")
        .select(
            "id", "parent", "depth", "first",
            (F.col("first") + F.col("size") - 1).alias("last"),
        )
        .localCheckpoint(eager=True)
    )

    # -- w1/w2: min/max first over NON-TREE incident edges ---------------
    # sym holds both directions, so one aggregate keyed on dst sees every
    # incident edge of every vertex exactly once per direction.
    ps = fl.select(F.col("id").alias("src"), F.col("parent").alias("p_src"),
                   F.col("first").alias("f_src"))
    pd_ = fl.select(F.col("id").alias("dst"), F.col("parent").alias("p_dst"))
    nt = (
        sym.join(ps, "src").join(pd_, "dst")
        .filter((F.col("p_dst") != F.col("src")) & (F.col("p_src") != F.col("dst")))
        .groupBy("dst")
        .agg(F.min("f_src").alias("nt_min"), F.max("f_src").alias("nt_max"))
        .withColumnRenamed("dst", "id")
    )
    wvals = fl.join(nt, "id", "left").select(
        "id", "parent", "depth",
        F.least("first", F.coalesce("nt_min", "first")).alias("low"),
        F.greatest("first", F.coalesce("nt_max", "first")).alias("high"),
    )

    # -- low/high = subtree min/max (bottom-up) ---------------------------
    lowhigh = _bottom_up(wvals, [("low", "min"), ("high", "max")], max_depth)

    return (
        fl.join(lowhigh.select("id", "low", "high"), "id")
        .select("id", "parent", "depth", "first", "last", "low", "high")
        .localCheckpoint(eager=True)
    )


def relabeled_forest(tree: DataFrame, tags: DataFrame) -> DataFrame:
    """(component, local_id, local_parent, id): the reference's ``Forest``
    output form — each spanning tree as its own relabeled subgraph
    (src/graph.h:436-443: per-tree vertex arrays with dense local ids).

    The preorder ``first`` tags ARE a dense 0-based per-tree numbering
    (root = 0, subtree-contiguous), so relabeling is one join: local id =
    first[v], local parent = first[parent(v)]. Rows are naturally
    partitionable by component — the Spark analog of the reference's
    per-tree CSR blocks.
    """
    pf = tags.select(F.col("id").alias("parent"), F.col("first").alias("pfirst"))
    return (
        tree.join(tags.select("id", "first"), "id")
        .join(pf, "parent")
        .select(
            "component",
            F.col("first").alias("local_id"),
            F.col("pfirst").alias("local_parent"),
            "id",
        )
    )


def fence_filter(sym: DataFrame, tags: DataFrame) -> DataFrame:
    """Edges that survive the FAST-BCC fence predicate (fast-bcc.h:239-254).

    Tree edge u=parent(v): drop iff *critical* — subtree(v)'s non-tree
    reach stays inside u's interval (first[u] <= low[v] and
    last[u] >= high[v]).  Non-tree edge: drop iff *backward* — one
    endpoint is the other's ancestor (its first falls in the other's
    interval).  Symmetric, so both directions of a kept edge survive.
    """
    ts = tags.select(
        F.col("id").alias("src"), F.col("parent").alias("p_src"),
        F.col("first").alias("f_src"), F.col("last").alias("l_src"),
        F.col("low").alias("lo_src"), F.col("high").alias("hi_src"),
    )
    td = tags.select(
        F.col("id").alias("dst"), F.col("parent").alias("p_dst"),
        F.col("first").alias("f_dst"), F.col("last").alias("l_dst"),
        F.col("low").alias("lo_dst"), F.col("high").alias("hi_dst"),
    )
    e = sym.join(ts, "src").join(td, "dst")
    critical_sd = (F.col("f_src") <= F.col("lo_dst")) & (F.col("l_src") >= F.col("hi_dst"))
    critical_ds = (F.col("f_dst") <= F.col("lo_src")) & (F.col("l_dst") >= F.col("hi_src"))
    backward_sd = (F.col("f_src") <= F.col("f_dst")) & (F.col("f_dst") <= F.col("l_src"))
    backward_ds = (F.col("f_dst") <= F.col("f_src")) & (F.col("f_src") <= F.col("l_dst"))
    keep = (
        F.when(F.col("p_dst") == F.col("src"), ~critical_sd)
        .when(F.col("p_src") == F.col("dst"), ~critical_ds)
        .otherwise(~backward_sd & ~backward_ds)
    )
    return e.filter(keep).select("src", "dst")


def bcc(sym: DataFrame, vertices: DataFrame, cc: DataFrame | None = None) -> DataFrame:
    """(id, bcc): FAST-BCC cluster label per vertex (fast-bcc.h:226-259).

    ``bcc`` = min vertex id in the vertex's fence-filtered connectivity
    cluster.  A biconnected component of G = one cluster plus its head
    (the cluster's shallowest vertex's parent); equivalently, every edge
    (u, v) of G belongs to the BCC labeled by the *deeper* endpoint's
    cluster (see ``bcc_edges``).
    """
    if cc is None:
        cc = connected_components_two_phase(sym, vertices)
    tree = spanning_tree(sym, vertices, cc)
    tags = tree_tags(tree, sym)
    filtered = fence_filter(sym, tags).localCheckpoint(eager=True)
    labels = connected_components_two_phase(filtered, vertices)
    return labels.select("id", F.col("component").alias("bcc"))


def bcc_edges(sym: DataFrame, vertices: DataFrame) -> DataFrame:
    """(src, dst, bcc) for src < dst: per-edge biconnected component.

    The BCC of an edge is the fence-cluster of its deeper endpoint
    (larger ``first``): for a critical tree edge that is the child's
    cluster (parent = head); for surviving edges both endpoints share a
    cluster; for a dropped back edge the descendant's cluster.
    """
    cc = connected_components_two_phase(sym, vertices)
    tree = spanning_tree(sym, vertices, cc)
    tags = tree_tags(tree, sym)
    filtered = fence_filter(sym, tags).localCheckpoint(eager=True)
    labels = connected_components_two_phase(filtered, vertices).select(
        "id", F.col("component").alias("lbl")
    )
    fx = tags.select("id", "first").join(labels, "id")
    e = (
        sym.filter(F.col("src") < F.col("dst"))
        .join(
            fx.select(F.col("id").alias("src"), F.col("first").alias("f_src"),
                      F.col("lbl").alias("lbl_src")),
            "src",
        )
        .join(
            fx.select(F.col("id").alias("dst"), F.col("first").alias("f_dst"),
                      F.col("lbl").alias("lbl_dst")),
            "dst",
        )
    )
    deeper = F.when(F.col("f_src") >= F.col("f_dst"), F.col("lbl_src")).otherwise(
        F.col("lbl_dst")
    )
    return e.select("src", "dst", deeper.alias("bcc"))


def articulation_points(sym: DataFrame, vertices: DataFrame) -> DataFrame:
    """(id): vertices whose removal disconnects their component.

    A vertex is an articulation point iff its incident edges span >= 2
    distinct biconnected components (the reference's component heads,
    fast-bcc.h:205-214, are exactly these).
    """
    e = bcc_edges(sym, vertices)
    both = e.select(F.col("src").alias("id"), "bcc").unionByName(
        e.select(F.col("dst").alias("id"), "bcc")
    )
    return (
        both.groupBy("id")
        .agg(F.countDistinct("bcc").alias("nb"))
        .filter(F.col("nb") >= 2)
        .select("id")
    )


def bcc_summary(sym: DataFrame, vertices: DataFrame) -> DataFrame:
    """One row (n_cc, n_bcc, largest_bcc_edges, n_bridges) — the
    reference's published artifact shape (src/BCC/fast-bcc.tsv:1,
    get_num_bcc at fast-bcc.h:261-282; bcc counted per distinct edge
    cluster, bridges = single-edge BCCs)."""
    cc = connected_components_two_phase(sym, vertices)
    n_cc = cc.select("component").distinct().count()
    e = bcc_edges(sym, vertices)
    per = e.groupBy("bcc").agg(F.count(F.lit(1)).alias("n_edges"))
    agg = per.agg(
        F.count(F.lit(1)).alias("n_bcc"),
        F.max("n_edges").alias("largest_bcc_edges"),
        F.sum(F.when(F.col("n_edges") == 1, 1).otherwise(0)).alias("n_bridges"),
    )
    return agg.select(
        F.lit(n_cc).cast("long").alias("n_cc"),
        F.col("n_bcc").cast("long"),
        F.col("largest_bcc_edges").cast("long"),
        F.col("n_bridges").cast("long"),
    )
