"""Arrow-batched per-partition kernels (the CSR-block physical path).

``pagerank_arrow`` is a drop-in alternative physical strategy for
``kernels.pagerank``: the message combine runs inside ``mapInPandas``
— each input partition's (dst, contrib) message block is CSR-packed with
NumPy (argsort by dst → segment boundaries → per-segment sums, i.e. the
partition-local equivalent of the reference's CSR build,
/root/reference/src/graph.h:445-473) and reduced to one partial row per
distinct dst before anything is shuffled. The JVM then only merges
partials (≤ |V| rows per partition instead of |E| rows).

When to prefer it: environments where JVM hash-aggregation threads scale
worse than Python worker *processes* (measured in this sandbox:
BASELINE.md), or when the combine logic outgrows algebraic aggregates.
The logical semantics are bit-compatible with the DataFrame kernel up to
floating-point summation order (tests assert 1e-9 agreement).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pasgal_spark.plans.lineage import pin

from pasgal_spark.graph.kernels import _StateChain


def _partial_combine(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Partition-local CSR-style combine: Σ contrib per dst, NumPy-side."""
    ids: list[np.ndarray] = []
    vals: list[np.ndarray] = []
    for pdf in it:
        ids.append(pdf["id"].to_numpy(dtype=np.int64, copy=False))
        vals.append(pdf["c"].to_numpy(dtype=np.float64, copy=False))
    if not ids:
        return
    i = np.concatenate(ids)
    v = np.concatenate(vals)
    # Arrow may hand us only empty batches; guard before indexing offsets
    # (offsets=[0,0] would index position 0 of a size-0 array).
    if not len(i):
        return
    # CSR pack: sort by key, find segment offsets, segment-sum
    order = np.argsort(i, kind="stable")
    i, v = i[order], v[order]
    boundaries = np.flatnonzero(np.diff(i)) + 1
    offsets = np.concatenate(([0], boundaries, [len(i)]))
    keys = i[offsets[:-1]]
    sums = np.add.reduceat(v, offsets[:-1])
    yield pd.DataFrame({"id": keys, "contrib": sums})


def pagerank_block_numpy(
    edges: DataFrame,
    vertices: DataFrame,
    *,
    iterations: int,
    damping: float = 0.85,
    partitions: int | None = None,
) -> DataFrame:
    """PageRank over dst-partitioned adjacency blocks, state in NumPy.

    The fully shuffle-free physical strategy (north_star: "CSR-packed
    per-partition adjacency blocks processed by pandas/Arrow UDFs"):

    - the edge table is hash-partitioned by dst ONCE and cached; per
      superstep the only Spark job is a ``mapInPandas`` scan of the cached
      blocks — no join, no exchange, no aggregate in the JVM;
    - the rank/out-degree vectors ride to the Python workers as a
      ``sc.broadcast`` NumPy array (4 MB at 500k vertices); each block
      segment-sums its messages by dst (disjoint dst ownership → partials
      are final) and ships back <= |V| rows via Arrow;
    - the O(|V|) state update is a vectorized NumPy expression.

    Scaling shape: per-superstep wall = parallel block scan + Arrow
    transfer; there is literally no cross-executor traffic, so throughput
    tracks core count as long as the substrate schedules processes (the
    extract pipeline's measured regime). The trade is the replicated
    state vector: valid while |V| doubles fit one worker (~10^8); past
    that, use ``pagerank_arrow``/``kernels.pagerank`` (distributed
    state). Requires dense vertex ids 0..n-1 (the engine's NodeId space).
    """
    spark = edges.sparkSession
    sc = spark.sparkContext
    n = vertices.count()
    assert (vertices.agg(F.max("id")).first()[0] or 0) < n, "ids must be dense 0..n-1"

    deg_pdf = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")).toPandas()
    out_deg = np.zeros(n, dtype=np.float64)
    out_deg[deg_pdf["src"].to_numpy()] = deg_pdf["d"].to_numpy()
    dangling = out_deg == 0
    safe_deg = np.where(dangling, 1.0, out_deg)

    p = partitions or sc.defaultParallelism
    blocks = edges.repartition(p, "dst").persist()
    blocks.count()
    bc_deg = sc.broadcast(safe_deg)

    rank = np.full(n, 1.0 / n)
    try:
        for _ in range(iterations):
            bc_rank = sc.broadcast(rank)

            def combine(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                r, d = bc_rank.value, bc_deg.value
                srcs: list[np.ndarray] = []
                dsts: list[np.ndarray] = []
                for pdf in it:
                    srcs.append(pdf["src"].to_numpy(dtype=np.int64, copy=False))
                    dsts.append(pdf["dst"].to_numpy(dtype=np.int64, copy=False))
                if not srcs:
                    return
                s = np.concatenate(srcs)
                t = np.concatenate(dsts)
                if not len(s):
                    return
                c = r[s] / d[s]
                order = np.argsort(t, kind="stable")
                t, c = t[order], c[order]
                bounds = np.flatnonzero(np.diff(t)) + 1
                offs = np.concatenate(([0], bounds))
                yield pd.DataFrame(
                    {"id": t[offs], "contrib": np.add.reduceat(c, offs)}
                )

            partials = blocks.mapInPandas(
                combine, "id long, contrib double"
            ).toPandas()
            contrib = np.zeros(n)
            # disjoint dst ownership per block -> one row per dst globally
            contrib[partials["id"].to_numpy()] = partials["contrib"].to_numpy()
            dm = rank[dangling].sum()
            rank = (1.0 - damping) / n + damping * (contrib + dm / n)
            bc_rank.destroy()
        out = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "rank": rank})
        return spark.createDataFrame(out)
    finally:
        blocks.unpersist()
        bc_deg.destroy()


def pagerank_blocked(
    edges: DataFrame,
    vertices: DataFrame,
    *,
    iterations: int,
    damping: float = 0.85,
    partitions: int | None = None,
) -> DataFrame:
    """PageRank over dst-partitioned CSR blocks with a broadcast state.

    The superstep plan with NO edge-scale shuffle at all:

    - the edge table is hash-partitioned by ``dst`` once and cached — the
      per-partition adjacency blocks of the north_star;
    - each superstep broadcast-joins the (small) rank state onto the
      blocks (local hash join per partition, no exchange) and combines
      messages inside ``mapInPandas`` (NumPy segment-sum);
    - because partitions own disjoint dst ranges, the per-partition
      partial sums ARE the final sums — the only shuffled relation per
      superstep is the O(|V|) partials/state, never the O(|E|) messages.

    Scaling shape: per-superstep work is an embarrassingly parallel map
    over cached blocks; JVM thread contention on a big shuffle (the
    measured pathology of this sandbox, BASELINE.md) is out of the loop.
    The trade is state replication: broadcast works while |V| rows fit an
    executor (~10^7); beyond that, fall back to ``pagerank_arrow`` /
    ``kernels.pagerank`` whose state moves by shuffle instead.
    """
    n = vertices.count()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    base = (
        vertices.join(deg, vertices.id == deg.src, "left")
        .select(vertices.id, F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
        .transform(pin)
    )
    has_dangling = base.filter("out_deg = 0").limit(1).count() > 0
    p = partitions or edges.sparkSession.sparkContext.defaultParallelism
    blocks = (
        edges.join(base.select(F.col("id").alias("src"), "out_deg"), "src")
        .repartition(p, "dst")
        .select("src", "dst", "out_deg")
        .persist()
    )
    blocks.count()
    state = base.withColumn("rank", F.lit(1.0 / n))
    chain = _StateChain(2)
    try:
        for it in range(iterations):
            sdf = state.select("id", (F.col("rank")).alias("rank"))
            msgs = (
                blocks.join(
                    F.broadcast(sdf.select(F.col("id").alias("src"), "rank")), "src"
                )
                .select(
                    F.col("dst").alias("id"),
                    (F.col("rank") / F.col("out_deg")).alias("c"),
                )
            )
            # disjoint dst ownership per partition -> partials are final
            sums = msgs.mapInPandas(_partial_combine, "id long, contrib double")
            if has_dangling:
                dangling = state.filter("out_deg = 0").agg(
                    F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
                )
                new_rank = (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0))
                       + F.col("_dm") / F.lit(float(n)))
                )
                new_state = (
                    base.join(sums, "id", "left")
                    .crossJoin(F.broadcast(dangling))
                    .select("id", "out_deg", new_rank.alias("rank"))
                )
            else:
                new_rank = F.lit((1.0 - damping) / n) + F.lit(damping) * F.coalesce(
                    F.col("contrib"), F.lit(0.0)
                )
                new_state = base.join(sums, "id", "left").select(
                    "id", "out_deg", new_rank.alias("rank")
                )
            state = chain.advance(new_state, force=(it == iterations - 1))
        return state.select("id", "rank")
    finally:
        blocks.unpersist()


def pagerank_arrow(
    edges: DataFrame,
    vertices: DataFrame,
    *,
    iterations: int,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """PageRank with Arrow/NumPy partition-local message combining."""
    n = vertices.count()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    base = (
        vertices.join(deg, vertices.id == deg.src, "left")
        .select(vertices.id, F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
        .transform(pin)
    )
    has_dangling = base.filter("out_deg = 0").limit(1).count() > 0
    state = base.withColumn("rank", F.lit(1.0 / n))
    chain = _StateChain(checkpoint_every)

    for it in range(iterations):
        msgs = (
            edges.join(state, edges.src == state.id)
            .select(edges.dst.alias("id"), (F.col("rank") / F.col("out_deg")).alias("c"))
        )
        partials = msgs.mapInPandas(_partial_combine, "id long, contrib double")
        sums = partials.groupBy("id").agg(F.sum("contrib").alias("contrib"))
        if has_dangling:
            dangling = state.filter("out_deg = 0").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
            )
            new_rank = (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.col("_dm") / F.lit(float(n)))
            )
            new_state = (
                base.join(sums, "id", "left")
                .crossJoin(F.broadcast(dangling))
                .select("id", "out_deg", new_rank.alias("rank"))
            )
        else:
            new_rank = F.lit((1.0 - damping) / n) + F.lit(damping) * F.coalesce(
                F.col("contrib"), F.lit(0.0)
            )
            new_state = base.join(sums, "id", "left").select(
                "id", "out_deg", new_rank.alias("rank")
            )
        new_state = chain.advance(new_state, force=(it == iterations - 1))
        state = new_state
    return state.select("id", "rank")
