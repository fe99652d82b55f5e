"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``      — brute-force exact top-k: broadcast the (small) query
                         set against the (huge) candidate table; scoring is an
                         Arrow-batched NumPy kernel with oracle-exact fold
                         order, cast to double so results are bit-reproducible.
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
# LSH bucket-size skew cap for bucketed_ann. Shared constant so the driver
# oracle (interpolated into its HAVING clause) cannot drift from the kernel
# default on a tuning pass — same pattern as dedup.MAX_BUCKET.
MAX_BUCKET = 5_000
# Per-task memory budget for the blocked Gram accumulation in bucketed_ann:
# each row-block holds ~3 block-sized double arrays (gram_block, s_block,
# one outer temp), so block_rows = BLOCK_BYTES / (3 * 8 * n).
BLOCK_BYTES = 64 * 1024 * 1024


def _validate_batch(e_col, dim: int | None = None):
    """Assert an Arrow batch's embedding column is non-null and dim-wide.

    ``dim=None`` derives the width from the first row AFTER the null
    check — deriving it before (``len(e_col.iloc[0])``) crashes with the
    exact opaque TypeError this guard exists to prevent when a null lands
    first in the batch.

    A ragged or null row would crash ``np.stack`` mid-job with an opaque
    error (the pre-r4 Catalyst expression degraded to null buckets
    instead); fail loudly with the offending row count before stacking.
    Cost is two vectorized passes over the batch — negligible next to the
    kernels' O(n*dim) work.
    """
    import numpy as np

    nulls = int(e_col.isna().sum())
    if nulls:
        raise ValueError(
            f"similarity kernel: {nulls} null embedding(s) in batch; "
            "filter nulls before bucketing/ANN"
        )
    if dim is None:
        dim = int(len(e_col.iloc[0]))
    lens = e_col.map(len).to_numpy()
    bad = int((lens != dim).sum())
    if bad:
        raise ValueError(
            f"similarity kernel: {bad} embedding(s) not {dim}-wide in batch "
            f"(saw lengths {sorted(set(lens.tolist()))[:5]})"
        )
    return np.stack(e_col.to_numpy())


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
    (which Spark runs as a WindowGroupLimit partial top-k per map
    partition, explain-asserted).

    Scoring is an Arrow-batched NumPy kernel (r5: the last interpreted-HOF
    hot path — three ~0.9 ms/row Catalyst folds per candidate, measured
    73 s at 200k vectors × 5 queries — linear CPU a 10^12-row corpus
    cannot afford). Per batch the dot and both norms accumulate in
    ascending element order, the identical left-to-right fold as the old
    HOF and the DuckDB oracle's list_dot_product, so scores stay
    bit-deterministic. Zero-norm embeddings raise (NaN cosines order
    differently in NumPy vs SQL ORDER BY — same precondition as
    ``bucketed_ann``).
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    # Raise candidate-side parallelism when the input has fewer splits
    # than cores (guide §2.5, input side): a small embeddings file is one
    # split, which would run the whole NumPy scoring pass single-threaded.
    # At corpus scale the scan already has more partitions and this is
    # skipped (the repartition would pointlessly move the vectors).
    sc = emb.sparkSession.sparkContext
    if e.rdd.getNumPartitions() < sc.defaultParallelism:
        e = e.repartition(sc.defaultParallelism)
    pairs = e.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))

    def _score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            x = _validate_batch(pdf["e"])
            dim = x.shape[1]
            qx = _validate_batch(pdf["qe"], dim)
            dot = np.zeros(len(pdf))
            ee = np.zeros(len(pdf))
            qq = np.zeros(len(pdf))
            for j in range(dim):  # ascending j: oracle-exact fold order
                dot += qx[:, j] * x[:, j]
                ee += x[:, j] * x[:, j]
                qq += qx[:, j] * qx[:, j]
            if not (ee.all() and qq.all()):
                raise ValueError(
                    "cosine_topk: zero-norm embedding(s); cosine is "
                    "undefined — filter them upstream"
                )
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(dtype=np.int64),
                    "neighbor_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "s": dot / (np.sqrt(qq) * np.sqrt(ee)),
                }
            )

    scored = pairs.select("query_id", "vec_id", "qe", "e").mapInPandas(
        _score, "query_id long, neighbor_id long, s double"
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
    src/graph.h:397-433). Arrow-batched NumPy kernel (mapInPandas): per
    batch, the (rows x planes) dot matrix accumulates as
    ``acc += outer(X[:, j], W[j, :])`` in ascending j — the identical
    left-to-right per-element fold as the DuckDB oracle's
    list_dot_product, so sign bits are bit-deterministic. Replaces the r3
    interpreted HOF fold, which cost ~0.9 ms/row (measured 18.5s for 20k
    vectors at the sf1 tier — linear-in-rows CPU that a 10^12-doc corpus
    cannot afford); the kernel is ~100x cheaper per row and embarrassingly
    parallel over batches.
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    # W[j, p]: weight of plane p at element j (0-based j == i-1)
    w = np.array(
        [
            [(p * 131071 + j * 524287) % 2001 - 1000 for p in range(n_planes)]
            for j in range(dim)
        ],
        dtype=np.float64,
    )
    bits = np.array([2 ** p for p in range(n_planes)], dtype=np.int64)

    def _buckets(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            x = _validate_batch(pdf["e"], dim)  # (n, dim) float64
            acc = np.zeros((len(pdf), n_planes))
            for j in range(dim):  # ascending j: oracle-exact fold order
                acc += np.outer(x[:, j], w[j])
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "bucket": ((acc > 0) @ bits).astype(np.int64),
                }
            )

    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    return e.mapInPandas(_buckets, "vec_id long, bucket long")


def bucketed_ann(
    emb: DataFrame, *, k: int = 3, max_bucket: int = MAX_BUCKET
) -> DataFrame:
    """(query_id, neighbor_id, score): ANN restricted to same-LSH-bucket pairs.

    The scale variant of ``cosine_topk``: candidates meet only inside a
    bucket (equi-join on bucket id) — recall trades against the n² scan.
    ``max_bucket`` caps the self-join blowup of a pathologically skewed
    bucket (cost per bucket is size², so one hot bucket of 10^7 vectors
    would dominate a 100 TB run): buckets above the cap contribute no
    pairs. The driver oracle interpolates the same ``MAX_BUCKET`` constant
    into its HAVING cap, so kernel and oracle cannot drift.

    Preconditions (assert-checked per batch): embeddings are non-null,
    uniform-width, and nonzero-norm — cosine is undefined for a zero
    vector and NaN ordering differs between NumPy and SQL ORDER BY, so the
    kernel refuses rather than silently diverging from the oracle.
    Peak per-task memory: ~``BLOCK_BYTES`` (64 MB) via blocked Gram
    accumulation, independent of bucket size.
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    # ONE Arrow pass computes the bucket AND carries the embedding through
    # (r6). The old shape derived `hyperplane_buckets` THREE times (cap
    # aggregate + semi-join side + the vec_id equi-join back to the
    # payload) — three Python kernel passes and a payload shuffle by
    # vec_id followed by another by bucket. Here the payload moves exactly
    # once, keyed by its final destination (guide §8: move heavy bytes
    # once); the skew cap becomes a count window over the same
    # bucket-keyed exchange, and the grouped kernel reuses that
    # partitioning (no second exchange). Bucket bits are bit-identical:
    # same plane matrix, same ascending-j fold as hyperplane_buckets.
    dim, n_planes = DIM, N_PLANES
    w = np.array(
        [
            [(p * 131071 + j * 524287) % 2001 - 1000 for p in range(n_planes)]
            for j in range(dim)
        ],
        dtype=np.float64,
    )
    bits = np.array([2 ** p for p in range(n_planes)], dtype=np.int64)

    def _buckets_with_vec(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            x = _validate_batch(pdf["e"], dim)
            acc = np.zeros((len(pdf), n_planes))
            for j in range(dim):  # ascending j: oracle-exact fold order
                acc += np.outer(x[:, j], w[j])
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "bucket": ((acc > 0) @ bits).astype(np.int64),
                    "e": pdf["e"],
                }
            )

    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    eb = e.mapInPandas(
        _buckets_with_vec, "vec_id long, bucket long, e array<double>"
    )

    # Per-bucket vectorized kernel (applyInPandas): a vector's every
    # candidate lives in its own bucket, so the within-bucket top-k IS the
    # global top-k. The r3 shape scored each pair with three interpreted
    # HOF folds (dot + both norms, the norms recomputed per pair) — 322s
    # at 20k vectors. Here the Gram matrix accumulates BLOCKED by row-range
    # as sum_j outer(X[B,j], X[:,j]) — every gram[i,k] element still sums
    # its dim terms in ascending-j order, identical to the HOF's (and the
    # DuckDB oracle's) left-to-right fold, so scores are bit-identical
    # while the arithmetic is NumPy-vectorized. Norms use the same
    # ascending-j fold (they equal the Gram diagonal bit-for-bit). Peak
    # per-task memory is ~3 block-sized arrays (gram_block, s_block, one
    # outer temp) = BLOCK_BYTES ≈ 64 MB, independent of max_bucket — the
    # unblocked r4 kernel peaked at ~3 * max_bucket^2 doubles ≈ 600 MB at
    # the 5000 cap, multiplied by concurrent bucket tasks.

    def _topk(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        # The skew cap lives IN the grouped kernel (r6): the groupBy
        # already delivers each bucket whole to one task, so an over-cap
        # bucket simply contributes no pairs — identical to the old
        # pre-filter (and to the oracle's HAVING cap) without a separate
        # counting pass over the payload. The capped bucket's rows still
        # shuffle once, but never pay the size² Gram.
        if n < 2 or (max_bucket is not None and n > max_bucket):
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "s": []}
            ).astype({"query_id": "int64", "neighbor_id": "int64", "s": "float64"})
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        x = _validate_batch(pdf["e"])
        dim = x.shape[1]
        # norm[i] = sqrt(sum_j x[i,j]^2), accumulated in ascending j —
        # bit-identical to the Gram diagonal under the same fold.
        sq = np.zeros(n)
        for j in range(dim):
            sq += x[:, j] * x[:, j]
        norm = np.sqrt(sq)
        if not norm.all():
            # A zero-norm vector yields NaN cosines; NumPy's lexsort and
            # the SQL engines' ORDER BY place NaN differently, so the
            # kernel and oracle would silently diverge. Precondition
            # (documented in the docstring): norms are nonzero.
            raise ValueError(
                f"bucketed_ann: {int((norm == 0).sum())} zero-norm "
                "embedding(s); cosine is undefined — filter them upstream"
            )
        block = max(1, int(BLOCK_BYTES // (3 * 8 * n)))
        out_q, out_n, out_s = [], [], []
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            gram_b = np.zeros((hi - lo, n))
            for j in range(dim):  # left-to-right fold, oracle-exact
                gram_b += np.outer(x[lo:hi, j], x[:, j])
            s_b = gram_b / np.outer(norm[lo:hi], norm)
            for i in range(lo, hi):
                row = s_b[i - lo]
                row[i] = -np.inf  # exclude the self-pair
                # ties: score desc, neighbor id asc (lexsort keys reversed)
                order = np.lexsort((ids, -row))[: min(k, n - 1)]
                out_q.extend([ids[i]] * len(order))
                out_n.extend(ids[order])
                out_s.extend(row[order])
        return pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_n, "s": out_s}
        )

    scored = eb.groupBy("bucket").applyInPandas(
        lambda _, pdf: _topk(pdf), "query_id long, neighbor_id long, s double"
    )
    # round in Spark (not NumPy) so the rounding rule matches cosine_topk
    # and the oracle exactly
    return scored.select(
        "query_id", "neighbor_id", F.round("s", 6).alias("score")
    )
