"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``      — brute-force exact top-k: broadcast the (small) query
                         set against the (huge) candidate table; all math is
                         JVM-side higher-order functions (zip_with/aggregate),
                         cast to double so results are bit-reproducible.
- ``hyperplane_buckets`` — LSH bucketing with deterministic pseudo-random
                         integer hyperplanes (no RNG state — the reference's
                         hash-derived-randomness idiom, src/graph.h:397-433).
                         The scale path: equality-join on bucket id replaces
                         the n² scan; brute force then runs per-bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DIM = 64
N_PLANES = 8


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk(
    emb: DataFrame, *, n_queries: int = 5, k: int = 5
) -> DataFrame:
    """(query_id, neighbor_id, score): exact cosine top-k per query vector.

    Queries = vec_id < n_queries (deterministic). The crossJoin broadcasts
    the tiny query side; candidates stream partition-local — at 100 TB this
    is one scan of the embedding table, no shuffle until the final top-k
    (which AQE handles as a partial+final window).
    """
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    pairs = e.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("qe"), F.col("e")).alias("s"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("s", 6).alias("score"))
    )


def hyperplane_buckets(
    emb: DataFrame, n_planes: int = N_PLANES, dim: int = DIM
) -> DataFrame:
    """(vec_id, bucket): sign-of-dot-product LSH bucket id (n_planes bits).

    Deterministic integer hyperplanes w_pj = (p*131071 + j*524287) % 2001
    - 1000 (no RNG state — the reference's hash-derived-randomness idiom,
    src/graph.h:397-433). All n_planes dot products are accumulated in ONE
    traversal of the embedding (an array-of-lanes fold), and the dots
    vector is materialized in its own projection so the per-plane sign
    bits read an attribute instead of re-expanding the fold n_planes
    times. Per-plane summation order (ascending j) is unchanged, so the
    result is bit-identical to separate dot products.
    """
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))

    def planes_at(i: Column) -> Column:  # weights of all planes at element i (1-based)
        return F.array(
            *[
                ((F.lit(p) * 131071 + (i - 1) * 524287) % 2001 - 1000).cast("double")
                for p in range(n_planes)
            ]
        )

    zero = F.array(*[F.lit(0.0)] * n_planes)
    dots = F.aggregate(
        F.sequence(F.lit(1), F.lit(dim)),
        zero,
        lambda acc, i: F.zip_with(
            acc, planes_at(i), lambda a, w: a + F.element_at(F.col("e"), i) * w
        ),
    )
    d = e.select("vec_id", dots.alias("dots"))
    bucket = None
    for p in range(n_planes):
        bit = F.when(F.element_at(F.col("dots"), p + 1) > 0, F.lit(2 ** p)).otherwise(
            F.lit(0)
        )
        bucket = bit if bucket is None else bucket + bit
    return d.select("vec_id", bucket.cast("long").alias("bucket"))


def bucketed_ann(
    emb: DataFrame, *, k: int = 3, max_bucket: int = 100_000
) -> DataFrame:
    """(query_id, neighbor_id, score): ANN restricted to same-LSH-bucket pairs.

    The scale variant of ``cosine_topk``: candidates meet only inside a
    bucket (equi-join on bucket id) — recall trades against the n² scan.
    ``max_bucket`` caps the self-join blowup of a pathologically skewed
    bucket (cost per bucket is size², so one hot bucket of 10^7 vectors
    would dominate a 100 TB run): buckets above the cap contribute no
    pairs. The driver oracle applies the identical HAVING cap.
    """
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    b = hyperplane_buckets(emb)
    if max_bucket is not None:
        ok = (
            b.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket)
            .select("bucket")
        )
        b = b.join(ok, "bucket", "left_semi")
    eb = e.join(b, "vec_id")
    left = eb.alias("l")
    right = eb.alias("r")
    pairs = left.join(
        right,
        (F.col("l.bucket") == F.col("r.bucket"))
        & (F.col("l.vec_id") != F.col("r.vec_id")),
    ).select(
        F.col("l.vec_id").alias("query_id"),
        F.col("r.vec_id").alias("neighbor_id"),
        cosine(F.col("l.e"), F.col("r.e")).alias("s"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("s", 6).alias("score"))
    )
