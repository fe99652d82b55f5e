"""Deduplication operators for web-scale corpora.

Pipeline mirror of large-crawl training-data dedup: exact (content hash),
MinHash + LSH banding (near-dup candidate generation), n-gram Jaccard
verification, SimHash fingerprints. All stages are DataFrame expressions
(shuffle = groupBy on content hash / band bucket — embarrassingly
partitionable at 100 TB; no pairwise all-to-all anywhere: candidate pairs
only materialize within an LSH band bucket).

The ``corpus`` view used by the driver queries simulates a re-crawl: the
``documents`` table unioned with every 10th doc re-ingested under a new id
— so dedup operators have true positives to find.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pasgal_spark.plans.lineage import pin

from pasgal_spark.functions.textstats import (
    portable_hash,
    shingles_from_tokens,
    tokens,
)

# MinHash/LSH selectivity (r5 retune, was 8 hashes / 4 bands / r=2).
# r=2 rows-per-band made candidate noise quadratic in corpus size: the sf10
# probe measured Σ bucket-pairs 1.02M -> 97.3M for 10x docs (95x) because a
# random-pair band collision needs only TWO minhash agreements — at 10^12
# docs that extrapolates to ~1e18 candidates, a scale non-starter. r=4
# squares the per-band noise rate (same probe: 97.3M -> ~0.5M, now dominated
# by the genuine dup cluster, i.e. linear in the true output), while 8 bands
# keep recall at the J=0.7 verify threshold at 1-(1-0.7^4)^8 ≈ 0.89 and
# exact dups (J=1) still collide in every band. The extra 24 hash lanes are
# map-side-combined columns in the ONE signature aggregate — linear, cheap,
# exactly the right trade against a quadratic candidate join.
NUM_HASHES = 32
BANDS = 8  # rows-per-band = NUM_HASHES // BANDS = 4
MAX_BUCKET = 5_000  # LSH bucket-size skew cap (see lsh_candidate_pairs)
MINHASH_P = 2**40       # permutation modulus (keeps a_i*h in int64)
MINHASH_B = 981_467     # permutation offset stride

# Portable corpus CTE (Spark SQL ∩ DuckDB).
CORPUS_CTE = """
doc_params AS (SELECT CAST(count(*) AS BIGINT) AS np FROM documents),
corpus AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + (SELECT np FROM doc_params) AS doc_id, text, lang
  FROM documents WHERE doc_id % 10 = 0
)
"""


def corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pasgal_spark.graph.builder import load_views

    load_views(spark, sf_dir, ["documents"])
    return spark.sql(f"WITH {CORPUS_CTE} SELECT doc_id, text, lang FROM corpus")


def exact_dedup(docs: DataFrame) -> DataFrame:
    """(doc_id, keeper, is_dup): group by content hash, keep min doc_id.

    The 100 TB plan: the text column is reduced to a 16-byte digest *at the
    scan* — only (doc_id, hash) rows ever shuffle. The keeper map is a
    map-side-combined groupBy (one row per distinct content), joined back to
    the digest projection; full documents never leave their input partition
    (a window over md5(text) would shuffle + sort the entire payload).
    """
    h = docs.select("doc_id", F.md5("text").alias("h"))
    keepers = h.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    return h.join(keepers, "h").select(
        "doc_id",
        "keeper",
        (F.col("doc_id") != F.col("keeper")).cast("boolean").alias("is_dup"),
    )


def _spread(docs: DataFrame) -> DataFrame:
    """Raise scan parallelism for CPU-heavy per-doc expansion (guide §2.5,
    input side): a small corpus file yields 1-2 input splits, which would
    run the shingle explode + per-shingle md5 single-threaded. Repartition
    UP to the cluster parallelism only when the input has fewer splits —
    at crawl scale the scan already has more partitions than cores and the
    (payload-moving) shuffle would be a pessimization, so it is skipped.
    Results are unaffected: every consumer aggregates with min/sum over
    rows whose values are row-local."""
    sc = docs.sparkSession.sparkContext
    par = sc.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        return docs.repartition(par)
    return docs


def minhash_pivot(docs: DataFrame, num_hashes: int = NUM_HASHES) -> DataFrame:
    """(doc_id, m0..m{k-1}): MinHash signature, one row per document.

    One md5 per distinct 3-token shingle; the k permutations are the classic
    arithmetic family h_i(x) = (a_i*h(x) + b_i) mod p, and all k mins are
    computed in a SINGLE map-side-combined aggregate over the un-exploded
    shingle rows — ``write_min`` as aggregation (reference src/utils.h:65-81
    idiom) without the k-fold row blowup of a per-seed explode.
    """
    # Two-phase tokenize→shingle: the token array materializes once per row
    # (multi-referenced alias, so Catalyst can't inline the tokenizer into
    # every element_at of the shingle window — see shingles_from_tokens).
    toks = (
        _spread(docs)
        .select("doc_id", tokens(F.col("text")).alias("t"))
        .select(
            "doc_id",
            F.explode(F.array_distinct(shingles_from_tokens(F.col("t")))).alias("tok"),
        )
    )
    base = toks.select(
        "doc_id", (portable_hash(F.col("tok")) % F.lit(MINHASH_P)).alias("h0")
    )
    perm = lambda k: (  # noqa: E731
        (F.lit(k * 2 + 1) * F.col("h0") + F.lit(k * MINHASH_B)) % F.lit(MINHASH_P)
    )
    return base.groupBy("doc_id").agg(
        *[F.min(perm(k)).alias(f"m{k}") for k in range(num_hashes)]
    )


def minhash_signatures(docs: DataFrame, num_hashes: int = NUM_HASHES) -> DataFrame:
    """(doc_id, seed, minhash): long-format signature view of the pivot.

    Shingles (not unigrams) so the signature discriminates word *order*,
    which a web corpus needs. The explode happens AFTER aggregation — k rows
    per document, not per shingle.
    """
    piv = minhash_pivot(docs, num_hashes)
    pairs = F.array(
        *[
            F.struct(F.lit(k).cast("int").alias("seed"), F.col(f"m{k}").alias("minhash"))
            for k in range(num_hashes)
        ]
    )
    return piv.select("doc_id", F.explode(pairs).alias("s")).select(
        "doc_id", F.col("s.seed").alias("seed"), F.col("s.minhash").alias("minhash")
    )


def lsh_bands(piv: DataFrame, bands: int = BANDS, num_hashes: int = NUM_HASHES) -> DataFrame:
    """(doc_id, band, band_hash): band the pivoted signature for bucket joins."""
    rpb = num_hashes // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "_", *[F.col(f"m{b * rpb + r}").cast("string") for r in range(rpb)]
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    return piv.select(
        "doc_id", F.explode(band_structs).alias("bh")
    ).select("doc_id", F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash"))


def lsh_candidate_pairs(
    docs: DataFrame,
    piv: DataFrame | None = None,
    *,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """(a, b) near-duplicate candidate pairs sharing any LSH band bucket.

    The scale path: the only join is an equi-join on (band, band_hash) —
    candidate pairs never cross bucket boundaries, so cost is
    Σ bucket_size², not n². a < b, deduped across bands. Pass a
    precomputed ``piv`` (minhash_pivot) to reuse cached signatures.
    ``max_bucket`` drops degenerate bands (e.g. the all-empty-text bucket
    of a dirty crawl) whose size² self-join would dominate at 100 TB —
    their members are near-certain duplicates of a cluster that exact
    dedup already collapses. The driver oracle applies the same cap.
    Default 5000 (r4): a 10x-scale stress run showed the old 100k cap was
    a no-op guard — one degenerate 50k-doc bucket ran a single executor
    task for 10+ minutes before the cap would ever have engaged; 5000
    bounds any one bucket's self-join at 25M pairs.
    """
    bands = lsh_bands(piv if piv is not None else minhash_pivot(docs))
    if max_bucket is not None:
        ok = (
            bands.groupBy("band", "band_hash")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket)
            .select("band", "band_hash")
        )
        bands = bands.join(ok, ["band", "band_hash"], "left_semi")
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )


def jaccard_verify(docs: DataFrame, pairs: DataFrame, threshold: float = 0.7) -> DataFrame:
    """(a, b, jaccard): exact token-set Jaccard on candidate pairs.

    Verification stage after LSH — only candidate pairs pay the set
    intersection, never the full corpus.
    """
    # Shingle sets are computed only for documents that appear in a pair:
    # semi-join first so the (rare) candidates pay the tokenize+hash cost,
    # never the full corpus.
    members = (
        pairs.select(F.col("a").alias("doc_id"))
        .unionByName(pairs.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    t = (
        docs.join(members, "doc_id", "left_semi")
        .select("doc_id", tokens(F.col("text")).alias("t"))
        .select("doc_id", F.array_distinct(shingles_from_tokens(F.col("t"))).alias("toks"))
        .cache()  # referenced twice (both pair sides)
    )
    try:
        j = (
            pairs.join(t.withColumnRenamed("doc_id", "a").withColumnRenamed("toks", "ta"), "a")
            .join(t.withColumnRenamed("doc_id", "b").withColumnRenamed("toks", "tb"), "b")
        )
        inter = F.size(F.array_intersect("ta", "tb"))
        union = F.size("ta") + F.size("tb") - inter
        jac = inter / union
        out = (
            j.select("a", "b", F.round(jac, 4).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
        )
        # Verified pairs ≪ corpus: materialize so the shingle cache can be
        # released before returning (no live-cache accumulation across calls).
        return out.transform(pin)
    finally:
        t.unpersist()


def near_dup_pipeline(docs: DataFrame, threshold: float = 0.7) -> DataFrame:
    """Full near-dup pipeline with intermediate caching: shingle → MinHash →
    LSH bands → candidate pairs → Jaccard verify. The bench/production
    entry point (pure stages above stay cache-free for oracle replay).

    Stage materialization stays the per-stage checkpoint (``pin``): an r6
    experiment replaced it with lazy leaf caches (zero jobs) and then
    cache+count — both LOST at the 10x tier (13.7-16.3 s vs 8.1-8.5 s
    same-window; the candidate self-join reads the signature relation
    four times, and cached-columnar reads + the stats-driven strategy
    flips they cause are costlier than one checkpoint write). Measured,
    reverted; see OPTIMIZATION_r06.md."""
    docs = docs.cache()
    try:
        piv = minhash_pivot(docs).transform(pin)
        pairs = lsh_candidate_pairs(docs, piv).transform(pin)
        return jaccard_verify(docs, pairs, threshold)
    finally:
        docs.unpersist()


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """(doc_id, simhash): bitwise-majority fingerprint over token hashes.

    Each distinct token votes ±1 per bit of its 32-bit hash; the fingerprint
    sets bits with positive vote sums. Exact-arithmetic formulation
    (floor-div by powers of two) so any engine reproduces it bit-for-bit.

    All ``bits`` votes of a token travel as ONE array-of-lanes row (the
    ``hyperplane_buckets`` fold idiom) and the per-doc vote sums are
    ``bits`` lane aggregates in a single groupBy — one shuffle, no
    per-bit row explosion (previously bits× rows through the first
    exchange). Map-side combine partial-aggregates the lanes, so a hub
    document contributes one combined row per map partition.
    """
    toks = _spread(docs).select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok")
    )
    h = toks.select(
        "doc_id", (portable_hash(F.col("tok")) % F.lit(2**32)).alias("h32")
    )
    # materialize the lane array before aggregating (one h32 read per lane)
    votes = F.array(
        *[
            (
                (F.floor(F.col("h32") / F.pow(F.lit(2.0), F.lit(b))).cast("long") % 2)
                * 2
                - 1
            )
            for b in range(bits)
        ]
    )
    v = h.select("doc_id", votes.alias("v"))
    agg = v.groupBy("doc_id").agg(
        *[F.sum(F.element_at(F.col("v"), b + 1)).alias(f"v{b}") for b in range(bits)]
    )
    fp = None
    for b in range(bits):
        w = F.when(F.col(f"v{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        fp = w if fp is None else fp + w
    return agg.select("doc_id", fp.cast("long").alias("simhash"))
