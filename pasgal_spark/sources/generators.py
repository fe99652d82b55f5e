"""Deterministic synthetic graph generators (reference §2A).

Spark-native ports of the reference's generators — pure column
expressions over ``spark.range``, no RNG state (determinism-by-hashing,
reference /root/reference/src/graph.h:397-433):

- ``random_graph`` — hash-derived edge list (generate_random_graph,
  src/utils/generate_random_graph.cpp:7-46);
- ``grid_graph``   — rows×cols torus with hash-chosen edge direction
  (generate_grid_graph.cpp:13-70) — the worst-case-diameter fixture class
  (reference diameters 59k-102k on 1000×100000 grids, diameter.tsv:8-9);
- ``with_hash_weights`` — w(u,v) = (hash(u) ^ hash(v)) % range + low
  (src/graph.h:309-327).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def random_graph(
    spark: SparkSession, n: int, m: int, *, seed: int = 42, dedup: bool = True
) -> DataFrame:
    """m hash-derived directed edges over vertices 0..n-1 (self-loops dropped)."""
    e = spark.range(m).select(
        (F.abs(F.xxhash64("id", F.lit(seed))) % n).alias("src"),
        (F.abs(F.xxhash64("id", F.lit(seed + 1))) % n).alias("dst"),
    ).filter("src <> dst")
    return e.distinct() if dedup else e


def grid_graph(
    spark: SparkSession, rows: int, cols: int, *, seed: int = 42, torus: bool = True
) -> DataFrame:
    """Grid graph, vertex id = r*cols + c; edges to right/down neighbors,
    direction chosen by hash (both directions when symmetrized later)."""
    v = spark.range(rows * cols).select(
        (F.col("id") / cols).cast("long").alias("r"),
        (F.col("id") % cols).alias("c"),
        F.col("id").alias("v"),
    )
    right_c = (F.col("c") + 1) % cols if torus else F.col("c") + 1
    down_r = (F.col("r") + 1) % rows if torus else F.col("r") + 1
    right = v.select(
        "v", (F.col("r") * cols + right_c).alias("u"), F.lit(0).alias("k")
    ).filter((F.col("c") + 1 < cols) | F.lit(torus))
    down = v.select(
        "v", (down_r * cols + F.col("c")).alias("u"), F.lit(1).alias("k")
    ).filter((F.col("r") + 1 < rows) | F.lit(torus))
    both = right.unionByName(down)
    flip = F.abs(F.xxhash64("v", "u", F.lit(seed))) % 2 == 0
    return both.select(
        F.when(flip, F.col("v")).otherwise(F.col("u")).alias("src"),
        F.when(flip, F.col("u")).otherwise(F.col("v")).alias("dst"),
    ).filter("src <> dst").distinct()


def with_hash_weights(
    edges: DataFrame,
    *,
    low: int = 1,
    rng: int = 1 << 18,
    seed: int = 42,
    scale: float | None = None,
) -> DataFrame:
    """Deterministic weights w(u,v) = (hash(u) ^ hash(v)) % rng + low.

    ``scale``: multiply the integer weight by a double factor, yielding
    deterministic *float* weights — the reference's ``-DFLOAT`` edge-data
    mode (src/SSSP/sssp.cpp:11-15, reader dispatch src/graph.h:147-155).
    A non-dyadic scale (e.g. 0.1) makes path sums exercise real floating-
    point rounding, which the SSSP float differential pins down.
    """
    w = (
        F.pmod(
            F.xxhash64(F.col("src"), F.lit(seed))
            .bitwiseXOR(F.xxhash64(F.col("dst"), F.lit(seed))),
            F.lit(rng),
        )
        + low
    )
    if scale is not None:
        w = w.cast("double") * F.lit(float(scale))
    return edges.withColumn("w", w)
