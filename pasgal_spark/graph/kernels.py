"""Iterative graph kernels as DataFrame supersteps.

Each kernel is the Spark-native re-expression of a reference algorithm
(citations are to /root/reference):

- ``pagerank``        — target kernel (north_rule); superstep skeleton is the
                        reference's Bellman-Ford relax loop shape
                        (src/SSSP/sssp.h:310-322): join state with edges,
                        combine messages with an aggregate. The atomic
                        ``write_add`` combiner (src/utils.h:45-63) becomes
                        ``groupBy(dst).agg(sum)``.
- ``connected_components`` — hash-min label propagation + pointer-jumping;
                        semantics of ``get_cc`` union-find
                        (external/connectivity.h:41-59); the CAS
                        link-high-to-low becomes a deterministic ``min``
                        aggregate; ``find_compress`` (external/connectivity.h:7-20)
                        becomes the label-table self-join shortcut.
- ``label_propagation`` — synchronous min-label adoption for K rounds — the
                        deterministic analog of LDD's first-arrival CAS
                        adoption (src/BCC/ldd.h:37-122).
- ``bfs`` / ``sssp``  — frontier supersteps; direction optimization
                        (src/BFS/bfs.h:160-162) is delegated to AQE's
                        broadcast-vs-shuffle choice on the frontier side.
- ``triangle_count``  — absent in the reference; standard degree-ordered
                        orientation + two joins over the edge table.
- ``degree_analytics`` — port of src/basic_analytics/basic_analytics.cpp:38-73.

Scale notes (100 TB framing): the edge table is the big, static relation —
it is scanned once per superstep and never shuffled after the initial
partitioning-by-src; only the small per-vertex state moves. Message combine
is expressed as partial+final hash aggregation (map-side combine), with an
optional explicit salting stage for hub keys (north_rule). Lineage is
truncated by eager localCheckpoint every ``checkpoint_every`` supersteps —
on a cluster this would be a parquet/Iceberg checkpoint (see
pasgal_spark.plans.checkpoints for the resumable variant).
"""

from __future__ import annotations

import os
import threading
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pasgal_spark.plans.lineage import fast_pin, pin

# Join-strategy hint for the state/frontier side of superstep joins
# (guide §3.1: pick the strategy deliberately). The edge table is cached
# hash-partitioned by src (builder.build_graph), so a shuffled join reuses
# that layout: the O(m) edge side feeds the join with NO per-superstep
# Exchange and only the O(|V|)-or-smaller state side moves. Without the
# hint Catalyst instead BROADCASTS whichever side's stats beat the
# threshold — at small tiers that is the edge table, re-broadcast every
# superstep; at big tiers neither fits and sort-merge re-exchanges the
# edge side (range partitioning never satisfied the hash requirement).
# Measured r6 (157k edges, 8 supersteps): shuffle_hash 3.7 s vs
# edge-broadcast 6.1 s vs sort-merge-hint 4.5 s. ``shuffle_hash`` builds
# the hash map from the per-partition slice of the SMALL state side
# (spillable in Spark 3.2+); set SPARK_GRAFT_STATE_JOIN_HINT=merge for
# strict sort-merge, or "none" to let Catalyst/AQE choose.
STATE_JOIN_HINT = os.environ.get("SPARK_GRAFT_STATE_JOIN_HINT", "shuffle_hash")


def _hint_state(df: DataFrame) -> DataFrame:
    """Apply the configured join-strategy hint to a state/frontier side.

    Only meaningful when the other (edge) side is the ingest-partitioned
    cached table; kernels joining against derived/shrunken edge sets skip
    it and let AQE decide."""
    if STATE_JOIN_HINT in ("shuffle_hash", "merge"):
        return df.hint(STATE_JOIN_HINT)
    return df


def _compile_overlapped(action, compile_thunk):
    """Run ``compile_thunk`` in a background thread while ``action`` runs
    on the calling thread; returns ``(action_result, compile_result)``.

    The r6 follow-up to the job-diet work (guide §1.2): after the fusion
    passes, a superstep's wall is ONE Catalyst compile (fast_pin's
    ``toRdd()``, measured 0.18-0.4 s at sf0.1) plus ONE probe job
    (0.12-0.35 s), serialized. But the compile of superstep k+1's plan
    depends only on superstep k's *leaf* — which exists before the probe
    runs — not on the probe's result, so the two legs can run
    concurrently (measured: 8 PageRank supersteps 2.8 s -> 1.9 s).

    Contract: ``compile_thunk`` must be a pure driver-side plan compile
    (fast_pin + cache registration) that launches NO jobs — all jobs stay
    on the calling thread, preserving the bench's cancellable job-group
    protocol. Exceptions from either leg propagate."""
    box: dict = {}

    def _bg() -> None:
        try:
            box["v"] = compile_thunk()
        except BaseException as e:  # noqa: BLE001 - re-raised on the caller
            box["e"] = e

    th = threading.Thread(target=_bg, daemon=True)
    th.start()
    try:
        res = action()
    finally:
        th.join()
    if "e" in box:
        raise box["e"]
    return res, box["v"]


class _StateChain:
    """Superstep state manager: cache every generation, checkpoint periodically.

    A superstep's state is referenced several times by the next plan
    (message join, scalar aggregates, convergence diff); leaving it lazy
    recomputes the whole chain per reference — measured 10x slowdowns at
    3M edges. ``cache()`` registers the plan so downstream plans substitute
    an InMemoryRelation (shallow plans, zero extra jobs); an eager
    ``localCheckpoint`` every ``every`` generations truncates lineage and
    lets superseded generations be unpersisted. On a cluster the
    localCheckpoint becomes a parquet/Iceberg write
    (pasgal_spark.plans.checkpoints).
    """

    def __init__(self, every: int = 4) -> None:
        self.every = max(1, every)
        self._gen = 0
        self._live: list[DataFrame] = []
        self.last_pinned = True  # no generation yet: nothing cache-backed

    def advance(self, df: DataFrame, *, force: bool = False) -> DataFrame:
        self._gen += 1
        if force or self._gen % self.every == 0:
            out = df.transform(pin)
            for c in self._live:
                c.unpersist()
            self._live = []
            self.last_pinned = True
        else:
            # fast_pin (r6): zero-job LogicalRDD rebind. A bare cache()
            # keeps the full logical tree, and generations referencing
            # their predecessor 2-3x make Catalyst's canonicalization
            # walks grow 4x PER GENERATION (measured: 54 s to plan
            # superstep 8 of a 157k-edge loop). The rebind keeps the
            # logical plan O(1) per generation; the periodic pin above
            # still truncates the accumulated RDD lineage. Rebind FIRST,
            # cache the leaf: the real plan compiles exactly once (caching
            # the original frame would compile it a second time for the
            # InMemoryRelation).
            out = fast_pin(df).cache()
            self._live.append(out)
            self.last_pinned = False
        return out

    def advance_overlapped(self, build, probe):
        """``advance(build())`` overlapped with ``probe()`` — the PREVIOUS
        generation's materializing action (see ``_compile_overlapped``).
        ``build`` is a thunk returning the next generation's PLAN: both
        the py4j DataFrame construction (~0.1 s/superstep) and the
        Catalyst compile ride the background thread. Returns
        ``(probe_result, new_generation)``.

        On pin generations the real pin launches a localCheckpoint job,
        which must stay on the calling thread (bench job-group contract),
        so those run sequentially — pin FIRST: executing the new
        generation populates the probed generation's cache as a
        byproduct, so the probe that follows is a warm-cache read instead
        of a full materialization (the new generation is computed before
        the probe's verdict, but that costs extra work only when
        convergence lands exactly on a pin generation — once per run at
        worst). Every other generation gets the full build/compile vs
        probe overlap."""
        self._gen += 1
        if self._gen % self.every == 0:
            out = build().transform(pin)
            row = probe()
            # Keep the PROBED (previous) generation's cache alive: unlike
            # ``advance``, the caller may still break with it (the new
            # generation here is speculative) and seal reads it.
            for c in self._live[:-1]:
                c.unpersist()
            self._live = self._live[-1:]
            self.last_pinned = True
            return row, out
        row, out = _compile_overlapped(probe, lambda: fast_pin(build()).cache())
        self._live.append(out)
        self.last_pinned = False
        return row, out

    def seal(self, df: DataFrame, *, pinned: bool | None = None) -> DataFrame:
        """Pin ``df`` (derived from the last generation) unless that
        generation is already checkpoint-backed, then release every live
        cache. Callers MUST route their return value through this (or pin
        it themselves) before the chain is closed — a cache()-backed final
        generation would otherwise recompute its whole lineage on first
        use after ``close()`` unpersists it.

        ``pinned``: overlapped loops break with the generation BEFORE the
        (speculative) last one, so ``last_pinned`` describes the wrong
        generation for them — they pass the sealed generation's own
        pinned-ness explicitly."""
        if pinned is None:
            pinned = self.last_pinned
        if not pinned:
            df = df.transform(pin)
        self.close()
        return df

    def close(self) -> None:
        for c in self._live:
            c.unpersist()
        self._live = []


def salted_sum(
    df: DataFrame, key: str, value: str, out: str, buckets: int = 8
) -> DataFrame:
    """Two-stage sum: partial per (key, salt) then final per key.

    Explicit skew taming for power-law hub keys. The salt spreads rows of
    one hot key over ``buckets`` reducers; the reference gets the same
    effect from per-worker local queues + atomic write_add
    (src/BFS/bfs.h:121-132, src/utils.h:45-63).

    MEASURED (BASELINE.md): for *algebraic* aggregates Spark's hash
    aggregation already partial-aggregates map-side, so each reducer
    receives at most one row per (map partition, key) — hub keys are
    already tamed, and the salted variant's extra shuffle costs ~3x
    (32.8s vs 15.5s for 6 PageRank supersteps on 3M edges). Use this only
    for non-combinable aggregates (collect_list/set, exact quantiles) or
    under aggregation modes that disable partial combine; PageRank and
    friends default to the plain aggregate (salt_buckets=0).
    """
    partial = (
        df.withColumn("_salt", F.spark_partition_id() % buckets)
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_psum"))
    )
    return partial.groupBy(key).agg(F.sum("_psum").alias(out))


# ---------------------------------------------------------------------------
# PageRank (target kernel)
# ---------------------------------------------------------------------------

def pagerank(
    edges: DataFrame,
    vertices: DataFrame,
    *,
    iterations: int | None = None,
    tol: float | None = None,
    damping: float = 0.85,
    # every generation is cache()-registered (see _StateChain), so chains
    # between eager checkpoints are shallow InMemoryRelation reads; 4
    # balances lineage truncation against one materialize job per cycle.
    checkpoint_every: int = 4,
    salt_buckets: int = 0,  # 0 = plain agg (map-side combine); see salted_sum
    on_superstep: Callable[[int, float], None] | None = None,
) -> DataFrame:
    """PageRank with dangling-mass redistribution.

    r'(v) = (1-d)/n + d * (Σ_{u→v} r(u)/outdeg(u) + dangling_mass/n)

    Stop after ``iterations`` supersteps (deterministic, oracle-matched) or
    when max |Δr| < ``tol``. Returns (id, rank).
    """
    assert iterations is not None or tol is not None
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # base is a cached leaf materialized by the prologue aggregate below —
    # ONE prologue job total (r6; was a checkpoint job + vertices.count()
    # + a separate dangling filter-count). The cache is released when the
    # kernel returns: the result is checkpoint-backed by then (tol: seal;
    # iterations: the forced final pin).
    base = fast_pin(
        vertices.join(deg, vertices.id == deg.src, "left")
        .select(vertices.id, F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
    ).cache()
    # The aggregate returns |V| AND the dangling count (the left join
    # preserves the vertex count exactly). Web graphs usually have
    # dangling pages, but when a derived graph has none the whole
    # dangling branch (scan + broadcast subquery per superstep) is dead
    # weight — check once up front.
    row = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("out_deg") == 0, 1).otherwise(0)).alias("nd"),
    ).first()
    n, n_dangling = row["n"], row["nd"]
    state = base.withColumn("rank", F.lit(1.0 / n))
    chain = _StateChain(checkpoint_every)
    has_dangling = n_dangling > 0

    try:
        if tol is not None:
            return _pagerank_tol(
                edges, state, chain,
                n=n, damping=damping, tol=tol, iterations=iterations,
                has_dangling=has_dangling,
                on_superstep=on_superstep,
            )
        return _pagerank_iterations(
            edges, state, chain,
            n=n, damping=damping, iterations=iterations,
            has_dangling=has_dangling, salt_buckets=salt_buckets,
            on_superstep=on_superstep,
        )
    finally:
        base.unpersist()


def _pagerank_iterations(
    edges: DataFrame,
    state: DataFrame,
    chain: _StateChain,
    *,
    n: int,
    damping: float,
    iterations: int,
    has_dangling: bool,
    salt_buckets: int,
    on_superstep: Callable[[int, float], None] | None,
) -> DataFrame:
    """Fixed-iteration PageRank superstep loop (deterministic,
    oracle-matched — the declared query's mode; aggregation structure
    unchanged since the oracle hash pinned it)."""
    it = 0
    while True:
        s = _hint_state(state)
        contribs = (
            edges.join(s, edges.src == s.id)
            .select(edges.dst.alias("id"), (F.col("rank") / F.col("out_deg")).alias("c"))
        )
        if salt_buckets:
            sums = salted_sum(contribs, "id", "c", "contrib", salt_buckets)
        else:
            sums = contribs.groupBy("id").agg(F.sum("c").alias("contrib"))
        # The superstep rebuilds every vertex row anyway, so join against the
        # *previous state* (not the static base) and carry the old rank as a
        # column — the convergence delta then costs one aggregate over the
        # new state instead of a second O(|V|) join-shuffle per superstep.
        prev = state.select("id", "out_deg", F.col("rank").alias("prev_rank"))
        # dangling mass is also damped: r' = (1-d)/n + d*(contrib + dangling/n)
        if has_dangling:
            # Dangling mass stays a (broadcast) 1-row relation — no separate
            # driver action per superstep; it joins into the same lazy plan.
            dangling = state.filter("out_deg = 0").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
            )
            new_rank = (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.col("_dm") / F.lit(float(n)))
            )
            new_state = (
                prev.join(sums, "id", "left")
                .crossJoin(F.broadcast(dangling))
                .select("id", "out_deg", new_rank.alias("rank"), "prev_rank")
            )
        else:
            new_rank = F.lit((1.0 - damping) / n) + F.lit(damping) * F.coalesce(
                F.col("contrib"), F.lit(0.0)
            )
            new_state = prev.join(sums, "id", "left").select(
                "id", "out_deg", new_rank.alias("rank"), "prev_rank"
            )
        last = iterations is not None and it + 1 >= iterations
        new_state = chain.advance(new_state, force=last)

        it += 1
        if on_superstep:
            on_superstep(it, float("nan"))
        state = new_state
        if it >= iterations:
            break

    out = state.select("id", "rank")
    chain.close()
    return out


def _pagerank_tol(
    edges: DataFrame,
    state: DataFrame,
    chain: _StateChain,
    *,
    n: int,
    damping: float,
    tol: float,
    iterations: int | None,
    has_dangling: bool,
    on_superstep: Callable[[int, float], None] | None,
) -> DataFrame:
    """Convergence-mode PageRank superstep loop (r6 fused + overlapped).

    Structural changes vs the iteration-mode loop, per guide §2.3/§2.4
    (fewer exchanges) and §1.2 (fewer, overlapped driver actions):

    - **One exchange per superstep.** The state row rides the SAME
      union+groupBy aggregate as the messages (the CC/LPA message-combine
      shape) instead of a second SortMergeJoin of prev⋈sums — the old
      shape paid 3 Exchanges per superstep (contrib agg + both join
      sides), this one pays 1. Ids absent from the state (edge targets
      outside ``vertices``) are dropped by the ``prev_rank IS NOT NULL``
      filter — exactly the old left-join semantics.
    - **One job per superstep, overlapped with the next compile.** The
      new state is cache()-registered (pinned every ``chain.every``
      generations) and ONE aggregate job both materializes it and returns
      the convergence delta. Because the superstep plan is
      DATA-INDEPENDENT — the dangling mass enters as a broadcast scalar
      aggregate over the previous state, not as a probe-derived literal —
      superstep k+1's Catalyst compile runs in a background thread while
      superstep k's probe job executes (``advance_overlapped``): the two
      legs each cost 0.15-0.4 s at small tiers and used to serialize.

    Results: identical per-vertex rank recurrence (the dangling term is
    ``Σ rank/ n`` over the same rows either way); double sums may differ
    in the last ulp from the join/literal shapes (same class as the
    Spark↔DuckDB fold difference the 6-decimal rounding already absorbs;
    pinned by the power-iteration allclose property test).
    """

    def build(cur: DataFrame) -> DataFrame:
        st = cur.select(
            "id",
            "out_deg",
            F.col("rank").alias("prev_rank"),
            F.lit(None).cast("double").alias("c"),
        )
        s = _hint_state(cur)
        msgs = edges.join(s, edges.src == s.id).select(
            edges.dst.alias("id"),
            F.lit(None).cast("long").alias("out_deg"),
            F.lit(None).cast("double").alias("prev_rank"),
            (F.col("rank") / F.col("out_deg")).alias("c"),
        )
        agg = (
            st.unionByName(msgs)
            .groupBy("id")
            .agg(
                F.min("out_deg").alias("out_deg"),
                F.coalesce(F.sum("c"), F.lit(0.0)).alias("contrib"),
                F.min("prev_rank").alias("prev_rank"),
            )
            .filter(F.col("prev_rank").isNotNull())
        )
        if has_dangling:
            # 1-row broadcast relation; joins into the same lazy plan, so
            # the plan needs nothing from the previous probe (the price of
            # a literal was a compile/probe data dependency).
            dm = cur.filter("out_deg = 0").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
            )
            new_rank = F.lit((1.0 - damping) / n) + F.lit(damping) * (
                F.col("contrib") + F.col("_dm") / F.lit(float(n))
            )
            return agg.crossJoin(F.broadcast(dm)).select(
                "id", "out_deg", new_rank.alias("rank"), "prev_rank"
            )
        new_rank = F.lit((1.0 - damping) / n) + F.lit(damping) * F.col("contrib")
        return agg.select("id", "out_deg", new_rank.alias("rank"), "prev_rank")

    cur = chain.advance(build(state))
    cur_pinned = chain.last_pinned
    it = 0
    while True:
        it += 1
        # Probe superstep ``it`` (materializes its cache, returns the
        # convergence delta) while speculatively compiling superstep
        # ``it+1`` against its leaf. On the converging superstep the
        # speculative generation is simply never executed (its cache is
        # registered but unmaterialized; seal releases it).
        row, nxt = chain.advance_overlapped(
            lambda: build(cur),
            lambda: cur.agg(
                F.max(F.abs(F.col("rank") - F.col("prev_rank"))).alias("d")
            ).first(),
        )
        delta = row["d"]
        if on_superstep:
            on_superstep(it, delta)
        if delta < tol or (iterations and it >= iterations):
            break
        cur, cur_pinned = nxt, chain.last_pinned

    # The final generation may be cache()-registered (not pinned): seal
    # pins the result BEFORE the generation caches are released.
    return chain.seal(cur.select("id", "rank"), pinned=cur_pinned)


# ---------------------------------------------------------------------------
# Connected components (target kernel)
# ---------------------------------------------------------------------------

def connected_components(
    sym: DataFrame,
    vertices: DataFrame,
    *,
    max_iterations: int = 100,
    checkpoint_every: int = 4,
    pointer_jump: bool = True,
    on_round: Callable[[int], None] | None = None,
) -> DataFrame:
    """Hash-min CC over a symmetrized edge table → (id, component).

    component = min vertex id in the component (canonical labels — the
    deterministic replacement for the reference's CAS-race labels,
    SURVEY.md §7.4). Pointer-jumping (label-of-label shortcut) gives
    O(log n)-ish rounds on long-diameter graphs — the declarative analog of
    ``find_compress`` path halving (external/connectivity.h:7-20).

    Frontier-based message passing (fused delta, same induction as
    ``label_propagation``): only vertices whose label changed last round
    (by relaxation OR pointer jump) send, so late rounds — when most of
    the graph has settled — shuffle frontier-incident edges instead of
    |E|. A stalled frontier is a true fixpoint: any u that still
    disagreed with a neighbor would have delivered its final label the
    round it last changed. The pointer-jump self-join stays over the full
    state (it is O(|V|), not O(|E|), and jump targets need not be in the
    frontier).
    """
    def step(labels: DataFrame, frontier: DataFrame) -> DataFrame:
        f = _hint_state(frontier)
        msgs = (
            sym.join(f, sym.src == f.id)
            .select(
                sym.dst.alias("id"),
                "component",
                F.lit(None).cast("long").alias("old"),
            )
        )
        st = labels.select("id", "component", F.col("component").alias("old"))
        new = (
            st.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"), F.min("old").alias("old"))
        )
        if pointer_jump:
            parent = new.select(
                F.col("id").alias("component"), F.col("component").alias("grand")
            )
            new = (
                new.join(parent, "component", "left")
                .select(
                    "id",
                    F.least("component", "grand").alias("component"),
                    "old",
                )
            )
        return new

    # ``old IS NULL`` = the vertex entered the state via messages only
    # (an edge endpoint absent from ``vertices``): it has never sent,
    # so it must be a sender next round — dropping it would freeze the
    # frontier into a false fixpoint (same rule as sssp's frontier)
    changed = F.col("old").isNull() | (F.col("component") < F.col("old"))
    labels0 = vertices.select("id", vertices.id.alias("component"))
    chain = _StateChain(checkpoint_every)
    # round 0: every vertex is a sender
    cur = chain.advance(step(labels0, labels0))
    cur_pinned = chain.last_pinned
    converged = False
    for it in range(max_iterations):
        # ONE aggregate job per round (r6): materializes the generation
        # AND counts the next frontier — OVERLAPPED with the next round's
        # Catalyst compile (the next plan depends only on this
        # generation's leaf, never on the probe's count). Zero frontier ⟺
        # no label changed ⟺ fixpoint (labels are monotone
        # non-increasing); on the converged round the speculative
        # generation is discarded unexecuted.
        row, nxt = chain.advance_overlapped(
            lambda: step(
                cur.select("id", "component"),
                cur.filter(changed).select("id", "component"),
            ),
            lambda: cur.agg(F.sum(F.when(changed, 1)).alias("nf")).first(),
        )
        n_frontier = row["nf"] or 0
        converged = n_frontier == 0
        if on_round:
            on_round(it)
        if converged:
            break
        cur, cur_pinned = nxt, chain.last_pinned
    if not converged:
        chain.close()
        # Raise-don't-truncate (same policy as reachability,
        # directed.py:57-62): silently returning unconverged labels would
        # hand callers wrong components on a >budget-diameter graph.
        raise RuntimeError(
            f"connected_components: labels still changing after "
            f"{max_iterations} supersteps; raise max_iterations "
            "(long-diameter graph) or use connected_components_two_phase"
        )
    return chain.seal(cur.select("id", "component"), pinned=cur_pinned)


def connected_components_two_phase(
    sym: DataFrame,
    vertices: DataFrame,
    *,
    shrink_rounds: int = 3,
    max_residual: int = 4_000_000,
    checkpoint_every: int = 2,
    on_round: Callable[[int], None] | None = None,
    m_upper: int | None = None,
) -> DataFrame:
    """Exact CC in a FIXED number of supersteps + driver union-find.

    The Spark rendition of the reference's two-phase connectivity
    (src/BCC/connectivity.h:44-107): LDD-style clustering to shrink the
    graph, then union-find over the few remaining inter-cluster edges.

    Phase 1: ``shrink_rounds`` min-label + pointer-jump supersteps — no
    convergence-detection jobs, so the superstep count is independent of
    graph diameter. Phase 2: contract to the DISTINCT inter-cluster label
    pairs (for a web graph after a few rounds this is tiny — the giant
    component contracts to one label, so its edges vanish in the
    distinct), assert the residual is driver-sized, finish with
    sequential union-find, and broadcast the label fix-ups back.

    Exact for any diameter: grids/chains (reference diameters 59k-102k,
    src/utils/diameter.tsv:8-9) no longer need O(diameter) supersteps.
    Labels are canonical min-ids, identical to ``connected_components``.

    Frontier-based shrink messaging (r6, the hash-min/LPA induction):
    only vertices whose label changed last round (relaxation OR pointer
    jump) send, so rounds 2..k shuffle frontier-incident edges instead of
    |E|. Per-round labels are identical to the all-senders form (monotone
    min: an unchanged u already delivered its label the round it last
    changed) — and even a different phase-1 labeling could not change the
    result, because phase 2 finishes connectivity exactly from ANY
    labeling whose residual fits the budget.

    Budget probe (r6 second wave, = ``connected_components_auto``'s fast
    path): when the deduped pair count provably fits the driver budget
    (m <= 2*max_residual for a symmetric edge table), the shrink rounds
    are pure overhead — phase 2 runs directly over identity labels
    (labels identical by the canonical-min-id contract, pinned by
    test_connected_components_auto_matches_two_phase; ``on_round`` never
    fires because no distributed round ran). Past the budget the fixed
    shrink supersteps engage unchanged — that is the 100 TB path.
    ``m_upper``: caller-known bound on ``sym.count()``, skips the probe.
    Precondition of the direct path (held by every engine caller): edge
    endpoints ⊆ ``vertices``.
    """
    if m_upper is None:
        m_upper = sym.count()
    if m_upper <= 2 * max_residual:
        identity = vertices.select("id", vertices.id.alias("component"))
        return cc_phase2_union_find(
            sym, identity, max_residual=max_residual,
            context="(two-phase: direct driver union-find)",
            identity_labels=True,
        )
    labels = vertices.select("id", vertices.id.alias("component"))
    frontier = labels  # round 0: every vertex is a sender
    chain = _StateChain(checkpoint_every)
    for it in range(shrink_rounds):
        f = _hint_state(frontier)
        msgs = (
            sym.join(f, sym.src == f.id)
            .select(
                sym.dst.alias("id"),
                "component",
                F.lit(None).cast("long").alias("old"),
            )
        )
        st = labels.select("id", "component", F.col("component").alias("old"))
        new = (
            st.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"), F.min("old").alias("old"))
        )
        parent = new.select(
            F.col("id").alias("component"), F.col("component").alias("grand")
        )
        new = (
            new.join(parent, "component", "left")
            .select("id", F.least("component", "grand").alias("component"), "old")
        )
        new = chain.advance(new)
        frontier = new.filter(
            F.col("old").isNull() | (F.col("component") < F.col("old"))
        ).select("id", "component")
        labels = new.select("id", "component")
        if on_round:
            on_round(it)
    # seal: pin the final labeling (it feeds three references in phase 2)
    # and release the generation caches. NO per-round driver action was
    # paid: the whole shrink chain executes lazily inside this one job.
    labels = chain.seal(labels)
    return cc_phase2_union_find(
        sym, labels, max_residual=max_residual,
        context=f"after {shrink_rounds} shrink rounds",
    )


def connected_components_auto(
    sym: DataFrame,
    vertices: DataFrame,
    *,
    max_residual: int = 4_000_000,
    m_upper: int | None = None,
) -> DataFrame:
    """Exact CC choosing the physical strategy from ONE edge-count probe:
    when the deduped pair count provably fits the driver budget
    (m <= 2 * max_residual for a symmetric edge table) skip the shrink
    supersteps entirely and run the budgeted driver union-find directly
    over identity labels — ``cc_phase2_union_find``'s own shape with zero
    distributed rounds. Past the budget, the two-phase path (fixed shrink
    supersteps + driver residual) engages unchanged: that is the 100 TB
    path, this is the small-graph job-count path. Labels are canonical min-ids
    either way (identical to ``connected_components_two_phase``).

    ``m_upper``: a caller-known upper bound on ``sym.count()`` (e.g. the
    pre-filter edge count for a filtered subgraph) — skips the probe job
    when the bound already fits the budget (r6)."""
    if m_upper is None or m_upper > 2 * max_residual:
        m_upper = sym.count()
    if m_upper <= 2 * max_residual:
        identity = vertices.select("id", vertices.id.alias("component"))
        return cc_phase2_union_find(
            sym, identity, max_residual=max_residual,
            context="(auto: direct driver union-find)",
            identity_labels=True,
        )
    return connected_components_two_phase(
        sym, vertices, max_residual=max_residual, m_upper=m_upper
    )


def cc_phase2_union_find(
    sym: DataFrame,
    labels: DataFrame,
    *,
    max_residual: int = 4_000_000,
    context: str = "",
    identity_labels: bool = False,
) -> DataFrame:
    """Finish connectivity from a shrunken labeling: contract to the
    DISTINCT inter-cluster label pairs, assert the residual is
    driver-sized, union-find sequentially, broadcast the fix-ups back.

    The Spark rendition of the reference's post-LDD union-find sweep
    (src/BCC/connectivity.h:69-85); shared by the in-memory and the
    checkpointed/resumable two-phase CC drivers.

    ``identity_labels=True``: the caller guarantees component == id for
    every vertex (the zero-shrink-round direct path), so the residual is
    just the deduped edge set — the two label relabeling joins compile
    away (r6: one aggregate over the cached edge table instead of two
    shuffled joins + aggregate).
    """
    if identity_labels:
        # precondition (callers assert it by construction): every edge
        # endpoint appears in ``labels`` — the join path below would
        # silently drop edges with unknown endpoints, the fast path keeps
        # them, so they must not exist
        residual = (
            sym.filter(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
            )
            .distinct()
        )
    else:
        lu = labels.select(F.col("id").alias("src"), F.col("component").alias("cu"))
        lv = labels.select(F.col("id").alias("dst"), F.col("component").alias("cv"))
        residual = (
            sym.join(lu, "src").join(lv, "dst")
            .filter(F.col("cu") != F.col("cv"))
            .select(F.least("cu", "cv").alias("a"), F.greatest("cu", "cv").alias("b"))
            .distinct()
        )
    # limit-bounded Arrow transfer (r6; was .collect() — 4M Row objects
    # cost ~10x the arrow path in driver time and memory at the budget edge)
    pdf = residual.limit(max_residual + 1).toPandas()
    if len(pdf) > max_residual:
        raise RuntimeError(
            f"two-phase CC residual exceeds {max_residual} pairs {context}; "
            "raise shrink_rounds"
        )
    if len(pdf) == 0:
        return labels.select("id", "component")

    # Sequential union-find with path halving (the declarative analog of
    # gbbs find_compress/UniteRemCAS, external/connectivity.h:7-59),
    # then canonicalize every merged group to its min member.
    uf: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while uf.get(r, r) != r:
            uf[r] = uf.get(uf[r], uf[r])
            r = uf[r]
        return r

    for a, b in zip(pdf["a"].tolist(), pdf["b"].tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            # link larger root under smaller: keeps roots = group minima
            if ra < rb:
                uf[rb] = ra
            else:
                uf[ra] = rb
    remap = [(x, find(x)) for x in list(uf) if find(x) != x]
    spark = labels.sparkSession
    map_df = spark.createDataFrame(remap, "component long, final long")
    return (
        labels.join(F.broadcast(map_df), "component", "left")
        .select("id", F.coalesce("final", "component").alias("component"))
    )


def largest_component(cc: DataFrame) -> DataFrame:
    """(component, size) of the largest CC — reference ``get_largest_cc``
    (external/connectivity.h:61-82)."""
    return (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .orderBy(F.desc("size"), F.asc("component"))
        .limit(1)
    )


def component_histogram(cc: DataFrame) -> DataFrame:
    """Component-size histogram — reference ``histogram_by_key``
    (external/connectivity.h:66)."""
    return (
        cc.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
    )


# ---------------------------------------------------------------------------
# Label propagation (target kernel)
# ---------------------------------------------------------------------------

def label_propagation(
    sym: DataFrame,
    vertices: DataFrame,
    *,
    rounds: int = 5,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Synchronous min-label LPA for a fixed number of rounds → (id, label).

    Each round every vertex adopts min(own label, neighbor labels) —
    deterministic version of LDD's first-arrival adoption
    (src/BCC/ldd.h:37-122). After k rounds label(v) = min id within v's
    k-hop closed neighborhood (the oracle-checkable invariant).

    Frontier-based message passing (fused delta, same pattern as
    ``pagerank``'s carried prev_rank): only vertices whose label CHANGED
    last round send messages, so per-round message volume is
    frontier-incident edges, not |E|. Per-round labels are identical to
    the all-senders formulation by monotone-min induction — a vertex u
    that did not change at round k-1 already delivered label(u) to every
    neighbor the round it last changed, and labels only decrease, so the
    neighbor folded it in. The previous label rides the state as ``old``
    (min(old) per group is exact: each id has exactly one state row), so
    frontier detection costs no extra join or shuffle.
    """
    labels = vertices.select("id", vertices.id.alias("label"))
    frontier = labels  # round 0: every vertex is a sender
    chain = _StateChain(checkpoint_every)
    label_t = dict(labels.dtypes)["label"]
    for it in range(rounds):
        f = _hint_state(frontier)
        msgs = (
            sym.join(f, sym.src == f.id)
            .select(
                sym.dst.alias("id"),
                "label",
                F.lit(None).cast(label_t).alias("old"),
            )
        )
        st = labels.select("id", "label", F.col("label").alias("old"))
        state = (
            st.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("label").alias("label"), F.min("old").alias("old"))
        )
        state = chain.advance(state, force=(it == rounds - 1))
        labels = state.select("id", "label")
        # old IS NULL: message-only vertex (endpoint absent from
        # ``vertices``) — never sent yet, keep it in the frontier
        frontier = state.filter(
            F.col("old").isNull() | (F.col("label") < F.col("old"))
        ).select("id", "label")
    return labels


def ldd(
    sym: DataFrame,
    vertices: DataFrame,
    *,
    beta_cap: int = 4,
    radius_cap: int = 8,
) -> DataFrame:
    """(id, label, cost): low-diameter decomposition with exponentially
    staggered center start times — the reference's LDD
    (src/BCC/ldd.h:16-249), in its declarative shifted-start form.

    Every vertex u is a potential center with a deterministic integer
    start time ``start(u) = beta_cap - min(tz(hash(u)), beta_cap)`` (tz =
    trailing zeros, i.e. a capped geometric(1/2) shift — the hash-seeded
    stand-in for the reference's exp(beta) wave release, ldd.h:37-122).
    v joins the cluster of the center minimizing
    ``(start(u) + dist(u, v), u)`` — first arrival wins, ties to the min
    center id, exactly the reference's CAS first-arrival adoption made
    deterministic. Every vertex is covered (it is its own center with
    cost start(v) <= beta_cap <= radius_cap), and cluster radii are
    bounded by ``radius_cap``, so the superstep count is FIXED at
    radius_cap regardless of graph diameter.

    The (cost, center) pair is packed as ``cost * 2^32 + center`` so the
    adoption rule is a single ``min`` aggregate (and the DuckDB oracle
    reproduces it with identical integer arithmetic).
    """
    from pasgal_spark.functions.textstats import portable_hash

    # Dense-NodeId precondition (the reference's uint32 NodeId,
    # src/graph.h:53): the (cost, center) pack is cost * 2^32 + id, so ids
    # outside [0, 2^32) would silently corrupt both fields. One aggregate,
    # paid once per call.
    lo, hi = vertices.agg(F.min("id"), F.max("id")).first()
    if lo is not None and (lo < 0 or hi >= 2 ** 32):
        raise ValueError(
            f"ldd: vertex ids must lie in [0, 2^32) for (cost, center) "
            f"packing; got range [{lo}, {hi}]"
        )

    h = portable_hash(F.col("id").cast("string"))
    start = F.when(h % F.lit(2 ** beta_cap) == 0, F.lit(0))
    for j in range(beta_cap - 1, 0, -1):
        start = start.when(h % F.lit(2 ** j) == 0, F.lit(beta_cap - j))
    start = start.otherwise(F.lit(beta_cap))

    big = F.lit(2 ** 32)
    state = vertices.select(
        "id", (start.cast("long") * big + F.col("id")).alias("key")
    )
    # Frontier-based (fused delta, same induction as label_propagation):
    # an unchanged u's message ``key(u) + 2^32`` is itself unchanged, so
    # it was already delivered the round u last changed — only changed
    # keys send. Per-round keys identical to the all-senders form.
    frontier = state
    cap_key = (radius_cap + 1) * 2 ** 32
    chain = _StateChain(3)
    for r in range(radius_cap):
        f = _hint_state(frontier)
        msgs = (
            sym.join(f, sym.src == f.id)
            .select(sym.dst.alias("id"), (F.col("key") + big).alias("key"))
            .filter(F.col("key") < F.lit(cap_key))
            .withColumn("old", F.lit(None).cast("long"))
        )
        st = state.select("id", "key", F.col("key").alias("old"))
        # cache + zero-job rebind per round, real pin every 3rd (r6, was
        # an eager checkpoint job EVERY round): the fixed-radius loop has
        # no convergence probes, so the whole wave executes lazily in the
        # periodic pin jobs.
        full = chain.advance(
            st.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("key").alias("key"), F.min("old").alias("old"))
        )
        state = full.select("id", "key")
        frontier = full.filter(
            F.col("old").isNull() | (F.col("key") < F.col("old"))
        ).select("id", "key")
    return chain.seal(
        state.select(
            "id",
            (F.col("key") % big).alias("label"),
            # exact integer unpack (shiftright, not double-division floor)
            F.shiftright(F.col("key"), 32).cast("long").alias("cost"),
        )
    )


# ---------------------------------------------------------------------------
# BFS / SSSP (frontier supersteps; reference §2D)
# ---------------------------------------------------------------------------

def bfs(
    sym: DataFrame,
    source: int = 0,
    *,
    max_depth: int = 30,
    checkpoint_every: int = 1,
    vertices: DataFrame | None = None,
    dense_threshold: float = 0.05,
    on_superstep: Callable[[int, str, int | None], None] | None = None,
) -> DataFrame:
    """Hop distances from ``source`` over the symmetric graph → (id, dist).

    Direction-optimizing frontier supersteps (reference
    src/BFS/bfs.h:140-222):

    - **push** (sparse frontier): expand the frontier's out-edges, dedup,
      anti-join visited — the edge work is proportional to the frontier's
      degree sum.
    - **pull** (dense frontier, needs ``vertices``): when the frontier
      exceeds ``dense_threshold * n``, flip to the reference's dense phase
      (bfs.h:140-158) — semi-join the edge table against the (small)
      *unvisited* set first, then against the frontier, so the edge work
      is proportional to the unvisited side's in-degree sum instead of the
      whole frontier's expansion. On small-diameter web graphs 2-3 dense
      supersteps carry most of the edges; this caps their shuffle at the
      shrinking unvisited set. The early-exit per vertex becomes the
      semi-join (first match wins, no dedup of |frontier| copies).

    Without ``vertices`` the loop is pure push (old behavior). Only
    vertices reached within ``max_depth`` hops are returned.
    """
    spark = sym.sparkSession
    visited = spark.createDataFrame([(source, 0)], "id long, dist int")
    frontier = visited
    n = vertices.count() if vertices is not None else None
    frontier_size, visited_size = 1, 1
    d = 0
    live_caches: list[DataFrame] = []
    # r6 job diet: per level ONE count job on the cached frontier (was:
    # eager-checkpoint nxt + count + eager-checkpoint visited = 3 jobs).
    # The visited set stays a lazy union of fast_pin'd frontier leaves,
    # re-pinned every 3 levels to bound RDD lineage and release caches.
    visited_pin_every = max(1, 3 * max(1, checkpoint_every))

    def build_push(depth: int, frontier: DataFrame, visited: DataFrame) -> DataFrame:
        f = _hint_state(frontier)
        return (
            sym.join(f, sym.src == f.id)
            .select(sym.dst.alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .withColumn("dist", F.lit(depth))
        )

    def build_pull(depth: int, frontier: DataFrame, visited: DataFrame) -> DataFrame:
        unvisited = vertices.join(visited.select("id"), "id", "left_anti")
        return (
            sym.join(unvisited.select(F.col("id").alias("dst")), "dst", "left_semi")
            .join(frontier.select(F.col("id").alias("src")), "src", "left_semi")
            .select(F.col("dst").alias("id"))
            .distinct()
            .withColumn("dist", F.lit(depth))
        )

    spec: DataFrame | None = None  # speculatively compiled next level (push)
    try:
        while d < max_depth:
            d += 1
            # Pull pays off only when the unvisited side is smaller than the
            # frontier (its edge work is ~unvisited in-degree vs frontier
            # expansion) — the reference's m_frontier vs m_unvisited test
            # (bfs.h:160-162) with counts as the degree proxy.
            unvisited_size = (n - visited_size) if n is not None else None
            dense = (
                n is not None
                and frontier_size > dense_threshold * n
                and 0 < unvisited_size < frontier_size
            )
            if spec is not None and not dense:
                nxt = spec  # compiled during the previous level's count
            else:
                if spec is not None:
                    spec.unpersist()  # speculation was push; level went dense
                # rebind-then-cache: one Catalyst compile per level (see
                # _StateChain.advance)
                nxt = fast_pin(
                    (build_pull if dense else build_push)(d, frontier, visited)
                ).cache()
            spec = None
            live_caches.append(nxt)
            will_pin_visited = d % visited_pin_every == 0
            if n is not None:
                # dense switch needs exact sizes; the count also
                # materializes the cache — one job per level, OVERLAPPED
                # with the speculative compile of the next level's push
                # shape (the plan depends only on this level's leaf; if
                # the count flips the next level to pull, the speculation
                # is discarded and the pull shape compiles sequentially —
                # at most 1-3 dense levels on a web BFS). Levels that
                # re-pin the visited union skip speculation: the pin
                # replaces the leaves the speculative plan would bind to.
                if not will_pin_visited and d < max_depth:
                    frontier_size, spec = _compile_overlapped(
                        nxt.count,
                        lambda: fast_pin(
                            build_push(d + 1, nxt, visited.unionByName(nxt))
                        ).cache(),
                    )
                else:
                    frontier_size = nxt.count()
                empty = frontier_size == 0
            else:
                # pure-push path: a limit-1 probe beats a full frontier scan;
                # the frontier size is genuinely unknown here, so the callback
                # receives None (not a sentinel; ADVICE r3)
                frontier_size = None
                empty = nxt.isEmpty()
            if on_superstep:
                on_superstep(d, "pull" if dense else "push", frontier_size)
            if empty:
                break
            if frontier_size is not None:
                visited_size += frontier_size
            visited = visited.unionByName(nxt)
            if will_pin_visited:
                if spec is not None:
                    spec.unpersist()
                    spec = None
                visited = pin(visited)
                for c in live_caches:
                    c.unpersist()
                live_caches = []
            frontier = nxt
        # pin the result before the frontier caches are released
        return pin(visited)
    finally:
        if spec is not None:
            spec.unpersist()
        for c in live_caches:
            c.unpersist()


def sssp(
    wedges: DataFrame,
    source: int = 0,
    *,
    cap: int = 40,
    max_iterations: int = 100,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Bellman-Ford shortest paths with distances capped at ``cap``.

    The reference's template-method SSSP (src/SSSP/sssp.h:196-236) with the
    Bellman-Ford threshold (src/SSSP/sssp.h:310-322): relax the entire
    frontier each superstep; ``write_min`` (src/utils.h:65-81) becomes
    ``groupBy(id).agg(min)``. Positive weights + cap bound the search.
    Returns (id, dist) for vertices with dist <= cap.

    Weight-type generic (the reference's ``-DFLOAT`` build,
    src/SSSP/sssp.cpp:11-15): ``dist`` adopts ``w``'s type, so integer
    and double weights both work. Float determinism stance: every
    candidate distance is a *left-to-right fold along one path*
    (``dist + w`` per relaxation) and the aggregate is a ``min`` over
    those per-path values — there is no reduction-order-dependent
    summation, so double results are bit-stable across partitionings and
    match a sequential Dijkstra exactly (tests/test_kernels.py).
    """
    spark = wedges.sparkSession
    wtype = dict(wedges.dtypes)["w"]
    zero = 0.0 if wtype in ("double", "float") else 0
    dist0 = spark.createDataFrame([(source, zero)], f"id long, dist {wtype}")

    # Frontier-based relaxation (the reference's frontier semantics,
    # sssp.h:196-236, and this engine's fused-delta pattern): only
    # vertices whose tentative distance changed last round relax their
    # out-edges. A distance the frontier delivered once never needs
    # re-delivery — dist+w candidates from an unchanged u are already
    # folded into every neighbor's min. Empty frontier ⟺ fixpoint.
    def step(dist: DataFrame, frontier: DataFrame) -> DataFrame:
        f = _hint_state(frontier)
        relaxed = (
            wedges.join(f, wedges.src == f.id)
            .select(
                wedges.dst.alias("id"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
            .filter(F.col("dist") <= cap)
            .withColumn("old", F.lit(None).cast(wtype))
        )
        st = dist.select("id", "dist", F.col("dist").alias("old"))
        return (
            st.unionByName(relaxed)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"), F.min("old").alias("old"))
        )

    # newly reached (old is null) or improved (dist < old) → frontier
    changed = F.col("old").isNull() | (F.col("dist") < F.col("old"))
    chain = _StateChain(max(2, checkpoint_every))
    cur = chain.advance(step(dist0, dist0))
    cur_pinned = chain.last_pinned
    converged = False
    for it in range(max_iterations):
        # ONE aggregate job per superstep (r6): materializes the
        # generation and counts senders — overlapped with the next
        # superstep's Catalyst compile (the relax plan depends only on
        # this generation's leaf; the speculative generation is discarded
        # unexecuted on the converged round).
        row, nxt = chain.advance_overlapped(
            lambda: step(
                cur.select("id", "dist"),
                cur.filter(changed).select("id", "dist"),
            ),
            lambda: cur.agg(F.sum(F.when(changed, 1)).alias("nf")).first(),
        )
        converged = (row["nf"] or 0) == 0
        if converged:
            break
        cur, cur_pinned = nxt, chain.last_pinned
    if not converged:
        chain.close()
        # Raise-don't-truncate (the CC/min-label policy): frozen tentative
        # distances are silently wrong answers, not approximations.
        raise RuntimeError(
            f"sssp: distances still improving after {max_iterations} "
            "supersteps; raise max_iterations (long-diameter or "
            "small-weight graph)"
        )
    return chain.seal(cur.select("id", "dist"), pinned=cur_pinned)


def sssp_delta_stepping(
    wedges: DataFrame,
    source: int = 0,
    *,
    delta: int = 8,
    cap: int = 40,
    max_iterations: int = 200,
) -> DataFrame:
    """Δ-stepping SSSP: relax in distance buckets of width ``delta``.

    The reference's template-method SSSP with the Δ threshold rule
    (src/SSSP/sssp.h:292-308: threshold advances by a fixed Δ). Per round,
    only tentative distances under the current threshold relax — light
    edges inside a bucket settle before the threshold advances, bounding
    wasted re-relaxations versus plain Bellman-Ford on weighted graphs.
    Results are identical to ``sssp`` (same cap semantics); only the
    physical superstep schedule differs. Weight-type generic like
    ``sssp`` (``-DFLOAT`` parity; same per-path-fold determinism stance).
    """
    spark = wedges.sparkSession
    wtype = dict(wedges.dtypes)["w"]
    zero = 0.0 if wtype in ("double", "float") else 0
    dist = spark.createDataFrame(
        [(source, zero)], f"id long, dist {wtype}"
    ).transform(pin)
    # ``rat`` = the tentative distance at which a vertex LAST relaxed its
    # out-edges (null = never relaxed). The active frontier is
    # sub-threshold vertices whose dist improved since they last relaxed
    # — without it, every settled vertex below the threshold re-relaxes
    # every round (O(rounds × settled edges), a scale-killer once the
    # settled prefix dominates). A delivered dist never needs
    # re-delivery: dist+w candidates from an unchanged sender are already
    # folded into every neighbor's min.
    dist = dist.withColumn("rat", F.lit(None).cast(wtype))
    threshold = delta
    chain = _StateChain(3)
    converged = False
    unsettled = F.col("rat").isNull() | (F.col("dist") < F.col("rat"))
    for _ in range(max_iterations):
        in_frontier = (F.col("dist") < threshold) & unsettled
        # ONE fused probe per round (r6, was isEmpty + a separate min-agg
        # job on empty buckets + an eager checkpoint): materializes the
        # latest generation, counts the active frontier, AND returns the
        # min unsettled distance so an empty delta-bucket jumps the
        # threshold with no extra job. The schedule changes, the result
        # cannot: bucket order only affects which rounds relax what.
        row = dist.agg(
            F.sum(F.when(in_frontier, 1)).alias("nf"),
            F.min(F.when(unsettled, F.col("dist"))).alias("mu"),
        ).first()
        if not (row["nf"] or 0):
            if row["mu"] is None:
                converged = True
                break
            threshold = (int(row["mu"] // delta) + 1) * delta
            continue
        frontier = _hint_state(dist.filter(in_frontier).select("id", "dist"))
        relaxed = (
            wedges.join(frontier, wedges.src == frontier.id)
            .select(wedges.dst.alias("id"), (F.col("dist") + F.col("w")).alias("dist"))
            .filter(F.col("dist") <= cap)
            .withColumn("rat", F.lit(None).cast(wtype))
        )
        st = dist.select(
            "id", "dist",
            F.when(in_frontier, F.col("dist")).otherwise(F.col("rat")).alias("rat"),
        )
        dist = chain.advance(
            st.unionByName(relaxed)
            .groupBy("id")
            # each id has exactly one state row, so min(rat) (nulls
            # skipped) is exactly that row's marker
            .agg(F.min("dist").alias("dist"), F.min("rat").alias("rat"))
        )
    if not converged:
        # probe-before-raise (ADVICE r3 boundary rule): the budget may
        # have run out exactly at the fixpoint
        converged = dist.filter(unsettled).isEmpty()
    if not converged:
        chain.close()
        raise RuntimeError(
            f"sssp_delta_stepping: unsettled vertices remain after "
            f"{max_iterations} rounds; raise max_iterations"
        )
    return chain.seal(dist.select("id", "dist"))


def sssp_rho_stepping(
    wedges: DataFrame,
    source: int = 0,
    *,
    rho: int = 64,
    cap: int = 40,
    max_iterations: int = 200,
) -> DataFrame:
    """ρ-stepping SSSP: per-round threshold = ρ-th smallest unsettled distance.

    The reference's template-method SSSP with the ρ threshold rule
    (src/SSSP/sssp.h:240-290): each outer round picks the ρ-th smallest
    tentative distance among unsettled vertices as the relaxation threshold,
    then relaxes the sub-threshold frontier to a fixpoint before advancing.
    The reference estimates the quantile from 1024 samples
    (src/SSSP/sssp.h:267-284); we compute it exactly and deterministically
    with a top-K (`orderBy(dist).limit(rho)` — TakeOrdered, no full sort),
    per the determinism stance in SURVEY.md §4.4. Results are identical to
    ``sssp`` / ``sssp_delta_stepping`` (same cap semantics); only the
    physical superstep schedule differs, so the same SQL oracle applies.
    """
    spark = wedges.sparkSession
    wtype = dict(wedges.dtypes)["w"]
    zero = 0.0 if wtype in ("double", "float") else 0
    dist = spark.createDataFrame(
        [(source, zero)], f"id long, dist {wtype}"
    ).transform(pin)
    # every dist <= settled_upto is final (positive weights); inclusive
    # bound so the rule is weight-type generic (``-DFLOAT`` parity) —
    # identical bucket schedule to the old ``int(top) + 1`` exclusive
    # form on integer weights
    settled_upto = None
    # ``rat`` marker, same as sssp_delta_stepping: relax only vertices
    # whose dist improved since they last relaxed — the old
    # frontier = (dist <= top) re-relaxed the ENTIRE settled prefix every
    # inner round.
    dist = dist.withColumn("rat", F.lit(None).cast(wtype))
    budget = max_iterations  # bounds total supersteps across all buckets
    chain = _StateChain(3)
    converged = False
    while budget > 0:
        unsettled = (
            dist if settled_upto is None
            else dist.filter(F.col("dist") > settled_upto)
        )
        top = unsettled.orderBy("dist").limit(rho).agg(F.max("dist")).first()[0]
        if top is None:
            converged = True
            break
        # inner fixpoint on the active bucket (dist <= the ρ-th smallest)
        while budget > 0:
            budget -= 1
            in_frontier = (F.col("dist") <= top) & (
                F.col("rat").isNull() | (F.col("dist") < F.col("rat"))
            )
            # ONE fused probe per inner round (r6, was isEmpty + an eager
            # checkpoint): materializes the latest generation and counts
            # the active frontier.
            nf = (
                dist.agg(F.sum(F.when(in_frontier, 1)).alias("nf")).first()["nf"]
                or 0
            )
            if not nf:
                break
            frontier = _hint_state(dist.filter(in_frontier).select("id", "dist"))
            relaxed = (
                wedges.join(frontier, wedges.src == frontier.id)
                .select(
                    wedges.dst.alias("id"), (F.col("dist") + F.col("w")).alias("dist")
                )
                .filter(F.col("dist") <= cap)
                .withColumn("rat", F.lit(None).cast(wtype))
            )
            st = dist.select(
                "id", "dist",
                F.when(in_frontier, F.col("dist"))
                .otherwise(F.col("rat"))
                .alias("rat"),
            )
            dist = chain.advance(
                st.unionByName(relaxed)
                .groupBy("id")
                # one state row per id → min(rat) (nulls skipped) is
                # exactly that row's marker
                .agg(F.min("dist").alias("dist"), F.min("rat").alias("rat"))
            )
        settled_upto = top
        if settled_upto >= cap:
            converged = True
            break
    if not converged:
        # probe-before-raise (ADVICE r3 boundary rule): the budget may
        # have run out exactly at the fixpoint — one cheap emptiness
        # probe distinguishes that from genuine truncation
        rem = (
            dist if settled_upto is None
            else dist.filter(F.col("dist") > settled_upto)
        )
        converged = rem.isEmpty()
    if not converged:
        chain.close()
        raise RuntimeError(
            f"sssp_rho_stepping: unsettled vertices remain after "
            f"{max_iterations} supersteps; raise max_iterations"
        )
    return chain.seal(dist.select("id", "dist"))


# ---------------------------------------------------------------------------
# Triangle counting (target kernel; no reference impl — SURVEY.md §2D)
# ---------------------------------------------------------------------------

def triangle_count(sym: DataFrame) -> DataFrame:
    """Exact global triangle count over the symmetrized graph → (triangles).

    Degree-ordered orientation: keep edge u→v iff (deg(u),u) < (deg(v),v),
    so every triangle is counted exactly once and the wedge join fans out
    from low-degree endpoints — the standard mitigation for power-law hubs
    (a hub's O(d²) wedges are never enumerated from the hub side).
    """
    # Spread the edge table UP to cluster parallelism when the ingest
    # layout has fewer partitions (r6, guide §2.5 input side): unlike the
    # superstep kernels (tiny per-round state, exchange-elision is what
    # matters), triangle counting is compute-bound — the orientation and
    # O(Σdeg²) wedge phases are broadcast-join-only (narrow), so their
    # parallelism is capped by sym's partition count, and the byte-derived
    # ingest layout at small tiers is 2 partitions. One round-robin
    # exchange of the O(m) pairs buys #cores-way parallelism for the
    # whole kernel (measured 1.5 s -> 0.8 s at sf0.1). At scale sym
    # already has more partitions than cores and the repartition is
    # skipped.
    sc = sym.sparkSession.sparkContext
    if sym.rdd.getNumPartitions() < sc.defaultParallelism:
        # keep the src hash layout: the degree aggregate then still needs
        # no re-exchange (round-robin measured ~2x worse here)
        sym = sym.repartition(sc.defaultParallelism, "src")
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).withColumnRenamed("src", "v")
    e = (
        sym.join(deg.alias("ds"), F.col("src") == F.col("ds.v"))
        .join(deg.alias("dd"), F.col("dst") == F.col("dd.v"))
        .filter(
            (F.col("ds.deg") < F.col("dd.deg"))
            | ((F.col("ds.deg") == F.col("dd.deg")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst")
    )
    e.cache()
    # Materialize BEFORE the wedge join is planned (r6): the cached
    # oriented-edge table then carries REAL size statistics, so Catalyst
    # broadcasts it only when it is genuinely under the threshold and
    # otherwise picks a parallel shuffled-hash join (preferSortMergeJoin
    # is off in the session defaults). The un-materialized estimate is a
    # join-product guess that chose broadcast for a 1.5M-row build at the
    # 10x tier (9.5 s vs 3.9 s).
    e.count()
    try:
        wedge = (
            e.alias("a")
            .join(e.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("x"), F.col("a.dst").alias("y"), F.col("b.dst").alias("z"))
        )
        tri = (
            wedge.join(
                e.alias("c"),
                (F.col("x") == F.col("c.src")) & (F.col("z") == F.col("c.dst")),
            )
            .agg(F.count(F.lit(1)).alias("triangles"))
        )
        # 1-row result: materialize so the oriented-edge cache can be released
        # before returning (repeated calls must not accumulate live caches).
        return tri.transform(pin)
    finally:
        e.unpersist()


# ---------------------------------------------------------------------------
# Degree analytics (reference src/basic_analytics/basic_analytics.cpp:38-73)
# ---------------------------------------------------------------------------

def degree_analytics(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """One-row summary: n, m, max/zero out-degree, max/zero in-degree.

    The reference computes these with sequential loops; here it is two
    partial-aggregated shuffles joined against the vertex universe (isolated
    vertices count as zero-degree — basic_analytics.cpp:52-63 semantics).
    """
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    in_deg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
    vo = vertices.join(out_deg, vertices.id == out_deg.src, "left").select(
        "id", F.coalesce("d", F.lit(0)).alias("out_d")
    )
    vi = vertices.join(in_deg, vertices.id == in_deg.dst, "left").select(
        "id", F.coalesce("d", F.lit(0)).alias("in_d")
    )
    n = vertices.agg(F.count(F.lit(1)).alias("n"))
    m = edges.agg(F.count(F.lit(1)).alias("m"))
    o = vo.agg(
        F.max("out_d").alias("max_out_deg"),
        F.sum(F.when(F.col("out_d") == 0, 1).otherwise(0)).alias("zero_out_deg"),
    )
    i = vi.agg(
        F.max("in_d").alias("max_in_deg"),
        F.sum(F.when(F.col("in_d") == 0, 1).otherwise(0)).alias("zero_in_deg"),
    )
    return n.crossJoin(m).crossJoin(o).crossJoin(i)
