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

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pasgal_spark.plans.lineage import fast_pin, pin

from pasgal_spark.graph.kernels import _StateChain, _hint_state


def _frontier_expand(
    edges: DataFrame,
    seed: DataFrame,
    key_cols: list[str],
    *,
    max_iterations: int,
    who: str,
    hinted: bool = True,
) -> DataFrame:
    """Shared BFS-style closure loop for reachability/multi_reachability.

    r6 job diet (was: eager-checkpoint nxt + isEmpty + eager-checkpoint
    visited = 3 jobs per level): per level ONE count job on the cached
    frontier; visited stays a lazy union of fast_pin'd leaves, re-pinned
    every 3 levels; the result is pinned before the caches are released.
    ``hinted``: apply the state-side join hint — only when ``edges`` is
    the ingest-partitioned cached table (scc passes False for its
    shrunken work graphs, where the hint would force a pointless
    edge-side exchange).
    """
    visited = seed.transform(pin)
    frontier = visited
    live_caches: list[DataFrame] = []
    try:
        for it in range(max_iterations + 1):
            f = _hint_state(frontier) if hinted else frontier
            nxt = (
                edges.join(f, edges.src == f.id)
                .select(edges.dst.alias("id"), *key_cols[1:])
                .distinct()
                .join(visited, key_cols, "left_anti")
            )
            # rebind-then-cache: one Catalyst compile per level (see
            # kernels._StateChain.advance)
            nxt = fast_pin(nxt).cache()
            live_caches.append(nxt)
            empty = nxt.count() == 0
            if empty:
                break
            if it == max_iterations:
                # probed after the emptiness test: a graph whose frontier
                # dies at exactly max_iterations succeeds (ADVICE r3)
                raise RuntimeError(
                    f"{who}: frontier still live after {max_iterations} "
                    "supersteps; raise max_iterations (long-diameter graph)"
                )
            visited = visited.unionByName(nxt)
            if (it + 1) % 3 == 0:
                visited = pin(visited)
                for c in live_caches:
                    c.unpersist()
                live_caches = []
            frontier = nxt
        return pin(visited)
    finally:
        for c in live_caches:
            c.unpersist()


def reachability(
    edges: DataFrame, source: int = 0, *, max_iterations: int = 100,
    hinted: bool = True,
) -> DataFrame:
    """(id) reachable from ``source`` over directed edges (incl. source).

    Raises if the superstep budget is exhausted with a live frontier —
    a silently truncated reach set would make callers (``scc``) settle
    wrong components; same raise-don't-truncate policy as ``scc``'s
    round budget.
    """
    spark = edges.sparkSession
    seed = spark.createDataFrame([(source,)], "id long")
    return _frontier_expand(
        edges, seed, ["id"],
        max_iterations=max_iterations, who="reachability", hinted=hinted,
    )


def multi_reachability(
    edges: DataFrame, sources: list[int], *, max_iterations: int = 100,
    hinted: bool = True,
) -> DataFrame:
    """(id, source): which of ``sources`` reaches each vertex.

    Propagates (vertex, label) pairs; `distinct()` per superstep is the
    shuffle-native replacement for the reference's resizable concurrent
    multimap (src/SCC/resizable_table.h:40-173).
    """
    spark = edges.sparkSession
    seed = spark.createDataFrame(
        [(s, s) for s in sources], "id long, source long"
    )
    return _frontier_expand(
        edges, seed, ["id", "source"],
        max_iterations=max_iterations, who="multi_reachability", hinted=hinted,
    )


def _min_label_to_fixpoint(
    edges: DataFrame, labels: DataFrame, *, max_iterations: int = 200
) -> DataFrame:
    """Propagate min label along directed edges until fixpoint.

    labels: (id, lbl) — every vertex present. Returns same shape.
    Frontier-based (fused delta, same induction as
    kernels.label_propagation): only vertices whose label changed last
    round send; an empty frontier is a true fixpoint (monotone min).
    """
    def step(labels: DataFrame, frontier: DataFrame) -> DataFrame:
        msgs = (
            edges.join(frontier, edges.src == frontier.id)
            .select(
                edges.dst.alias("id"),
                "lbl",
                F.lit(None).cast("long").alias("old"),
            )
        )
        st = labels.select("id", "lbl", F.col("lbl").alias("old"))
        return (
            st.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"), F.min("old").alias("old"))
        )

    changed = F.col("old").isNull() | (F.col("lbl") < F.col("old"))
    chain = _StateChain(3)
    # round 0: every vertex is a sender
    cur = chain.advance(step(labels, labels))
    cur_pinned = chain.last_pinned
    converged = False
    for _ in range(max_iterations):
        # ONE fused aggregate job per round (r6): materializes the
        # generation and counts senders — overlapped with the next
        # round's Catalyst compile (kernels._compile_overlapped; the next
        # plan depends only on this generation's leaf).
        row, nxt = chain.advance_overlapped(
            lambda: step(
                cur.select("id", "lbl"),
                cur.filter(changed).select("id", "lbl"),
            ),
            lambda: cur.agg(F.sum(F.when(changed, 1)).alias("nf")).first(),
        )
        converged = (row["nf"] or 0) == 0
        if converged:
            break
        cur, cur_pinned = nxt, chain.last_pinned
    if not converged:
        chain.close()
        # Raise-don't-truncate (same policy as reachability above):
        # unconverged min-labels would make scc() settle wrong components.
        raise RuntimeError(
            f"_min_label_to_fixpoint: labels still changing after "
            f"{max_iterations} supersteps; raise max_iterations "
            "(long-diameter graph)"
        )
    return chain.seal(cur.select("id", "lbl"), pinned=cur_pinned)


def scc(
    edges: DataFrame,
    vertices: DataFrame,
    *,
    trim_iterations: int = 10,
    batch0: int = 4,
    growth: float = 1.5,
    max_rounds: int = 64,
    on_round: Callable[[str, int], None] | None = None,
) -> DataFrame:
    """(id, scc): strongly connected components, scc = min member id.

    The reference's scalable SCC strategy (src/SCC/scc.h:78-103):

    1. **Trim** (scc.h:39-49): vertices with zero in- or out-degree within
       the working graph are singleton SCCs — settle them in bulk,
       iterated to a (capped) fixpoint.
    2. **Giant-first** (scc.h:50-77): one forward + one backward
       reachability from a deterministically-picked high-degree source;
       the intersection is that source's SCC — on web graphs the giant
       one — settled in two BFS passes.
    3. **Exponential multi-source batches** (scc.h:100-103): remaining
       vertices in deterministic hash order, batch sizes growing by
       ``growth``; per batch, SCC(s) = fwd_reach(s) ∩ bwd_reach(s) for
       every source s at once (multi-reachability), so a chain of k
       trivial/small SCCs settles in O(log k) batch rounds instead of the
       O(k) phases of min-label coloring (kept as ``scc_coloring``).

    Raises if the round budget is exhausted with vertices unsettled
    (every batch settles at least its sources, so this bounds runaways
    rather than silently returning a partial result).
    """
    spark = edges.sparkSession
    work_vertices = vertices.select("id").transform(pin)
    work_edges = edges.transform(pin)
    settled_parts: list[DataFrame] = []

    def shrink(newly: DataFrame) -> None:
        nonlocal work_vertices, work_edges
        work_vertices = work_vertices.join(newly, "id", "left_anti").transform(pin)
        work_edges = (
            work_edges.join(newly.select(F.col("id").alias("src")), "src", "left_anti")
            .join(newly.select(F.col("id").alias("dst")), "dst", "left_anti")
            .select("src", "dst")
            .transform(pin)
        )

    # -- 1. trim ----------------------------------------------------------
    for t in range(trim_iterations):
        outs = work_edges.select(F.col("src").alias("id")).distinct()
        ins = work_edges.select(F.col("dst").alias("id")).distinct()
        trivial = (
            work_vertices.join(outs, "id", "left_anti")
            .unionByName(work_vertices.join(ins, "id", "left_anti"))
            .distinct()
            .transform(pin)
        )
        if trivial.isEmpty():
            break
        settled_parts.append(trivial.select("id", F.col("id").alias("scc")))
        shrink(trivial)
        if on_round:
            on_round("trim", t)

    # -- 2. giant-first -----------------------------------------------------
    if not work_vertices.isEmpty():
        od = work_edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
        idg = work_edges.groupBy("dst").agg(F.count(F.lit(1)).alias("idg"))
        pick = (
            work_vertices.join(od, work_vertices.id == od.src, "left")
            .join(idg, work_vertices.id == idg.dst, "left")
            .select(
                "id",
                (F.coalesce("od", F.lit(0)) * F.coalesce("idg", F.lit(0))).alias("dp"),
            )
            .orderBy(F.desc("dp"), F.asc("id"))
            .first()
        )
        source = pick["id"]
        fwd = reachability(work_edges, source, hinted=False)
        bwd = reachability(
            work_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
            source,
            hinted=False,
        )
        giant = fwd.join(bwd, "id").transform(pin)
        lbl = giant.agg(F.min("id")).first()[0]
        settled_parts.append(giant.select("id", F.lit(lbl).cast("long").alias("scc")))
        shrink(giant)
        if on_round:
            on_round("giant", 0)

    # -- 3. exponential multi-source batches --------------------------------
    batch = batch0
    rounds = 0
    while not work_vertices.isEmpty():
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"scc: round budget ({max_rounds}) exhausted with "
                f"{work_vertices.count()} vertices unsettled"
            )
        srcs = [
            r["id"]
            for r in work_vertices.orderBy(
                F.abs(F.xxhash64("id")), F.asc("id")
            ).limit(batch).collect()
        ]
        fwd = multi_reachability(work_edges, srcs, hinted=False)
        bwd = multi_reachability(
            work_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
            srcs,
            hinted=False,
        )
        members = fwd.join(bwd, ["id", "source"])
        lbls = members.groupBy("source").agg(F.min("id").alias("scc"))
        newly = (
            members.join(lbls, "source").select("id", "scc").distinct()
        ).transform(pin)
        settled_parts.append(newly)
        shrink(newly)
        if on_round:
            on_round("batch", rounds)
        batch = min(int(batch * growth) + 1, 4096)

    if not settled_parts:
        return spark.createDataFrame([], "id long, scc long")
    out = settled_parts[0]
    for df in settled_parts[1:]:
        out = out.unionByName(df)
    return out.select("id", "scc")


def scc_coloring(
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

    Kept as the BGSS-style baseline; ``scc`` (trim + giant-first + batched
    multi-reach) is the scalable default — coloring settles one color
    generation per phase, which is O(chain length) phases on SCC-chain
    topologies (see tests/test_directed.py).
    """
    settled = None  # (id, scc)
    work_edges = edges.transform(pin)
    work_vertices = vertices.select("id").transform(pin)

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
            .transform(pin)
        )
        roots = colors.filter("id = color").select(
            "id", F.col("id").alias("source")
        )
        # backward frontier propagation from all roots at once
        visited = roots.transform(pin)
        frontier = visited
        while True:
            nxt = (
                ec.join(frontier, ec.src == frontier.id)
                .select(ec.dst.alias("id"), "source")
                .distinct()
                .join(visited, ["id", "source"], "left_anti")
                .transform(pin)
            )
            if nxt.isEmpty():
                break
            visited = visited.unionByName(nxt).transform(pin)
            frontier = nxt
        # a vertex can only be backward-reached by its own color's root
        # (edges are color-internal and sources are the color roots)
        newly = visited.withColumnRenamed("source", "scc")
        if newly.isEmpty():  # defensive: every phase settles >= the roots
            break

        settled = (
            newly if settled is None else settled.unionByName(newly)
        ).transform(pin)

        work_vertices = work_vertices.join(newly, "id", "left_anti").transform(pin)
        work_edges = (
            work_edges.join(newly.select(F.col("id").alias("src")), "src", "left_anti")
            .join(newly.select(F.col("id").alias("dst")), "dst", "left_anti")
            .select("src", "dst")
            .transform(pin)
        )
    if settled is None:
        return vertices.sparkSession.createDataFrame([], "id long, scc long")
    return settled.select("id", "scc")


def spanning_forest(sym: DataFrame, vertices: DataFrame, cc: DataFrame) -> DataFrame:
    """(child, parent, component): a spanning forest of the symmetric graph.

    Diameter-safe (VERDICT r3 #3 — this was the last O(diameter) kernel):
    the forest edge set comes from Borůvka contraction (<= log2(n) rounds,
    ``euler.boruvka_forest``) and the root-ward orientation from the Euler
    machinery's entering-arc tags (``euler.euler_tags``: parent(v) = tail
    of v's minimum entering arc — a tree neighbor, deterministic), so the
    superstep count is O(log n) at any diameter. Same output contract as
    the reference's spanning forest (src/BCC/spanning_forest.h:5-60) with
    deterministic parents instead of CAS races: per component, size-1
    edges rooted at the canonical min-id root.
    """
    from pasgal_spark.graph.euler import boruvka_forest, euler_tags

    forest = boruvka_forest(sym, vertices)
    tags = euler_tags(forest, cc)
    return (
        tags.filter(F.col("id") != F.col("component"))
        .select(F.col("id").alias("child"), "parent", "component")
    )
