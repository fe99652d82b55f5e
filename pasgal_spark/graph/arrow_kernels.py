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
        .localCheckpoint(eager=True)
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
