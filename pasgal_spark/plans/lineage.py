"""Lineage truncation that also resets Catalyst's inherited statistics.

``pin(df)`` is the engine's materialize-and-truncate primitive, used by
every iterative kernel in place of a bare ``localCheckpoint``.

Why not plain ``localCheckpoint``: in Spark 4 (classic) a checkpoint's
``LogicalRDD`` *inherits* the statistics of the plan it truncates
(``LogicalRDD.rewriteStatsAndConstraints``, sql/execution/ExistingRDD).
Catalyst's size-only stats visitor multiplies child sizes at every join,
so a superstep that references the previous generation twice (message
join + convergence/self join) doubles the carried ``sizeInBytes`` bit
length — and because checkpoints *propagate* the product instead of
resetting it, an iterative pipeline with G generations carries
``O(2^G)``-bit BigIntegers. Measured here: the 40+-generation BCC euler
path spent 20+ minutes of driver CPU inside ``BigInteger.multiply``
during planning (stack: ``SizeInBytesOnlyStatsPlanVisitor`` →
``rewriteStatsAndConstraints`` → ``Dataset.checkpoint``).

``pin`` materializes via eager ``localCheckpoint`` (same fault-tolerance
story) and then rebuilds the DataFrame directly over the checkpointed
``RDD[InternalRow]`` (``SparkSession.internalCreateDataFrame``), which
constructs a fresh ``LogicalRDD`` *without* the stats rewrite — its
sizeInBytes is the conf default, so per-generation stats stay O(1) bits
and planning cost is flat no matter how many supersteps run. Join
strategy is unaffected: state relations were never auto-broadcast
anyway (both the inherited product and the default exceed any broadcast
threshold); explicit ``F.broadcast`` hints still apply.

On a cluster the same role is played by parquet/Iceberg checkpoints
(``pasgal_spark.plans.checkpoints``), whose read-back scans carry real
file-size stats — naturally bounded. ``pin`` is the in-memory analog.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

_log = logging.getLogger(__name__)
_warned_fallback = False


def fast_pin(df: DataFrame) -> DataFrame:
    """ZERO-JOB logical-lineage truncation (r6): rebuild ``df`` as a
    ``LogicalRDD`` leaf over its (lazily) compiled RDD.

    Why it exists: a superstep that only ``cache()``s its generations
    keeps the full logical tree, and because each generation references
    the previous one twice (state row + message join), Catalyst's
    canonicalization / cache-lookup walks expand the shared DAG into a
    tree — measured 4x cost growth PER GENERATION in round 6 (54 s for
    superstep 8 of a trivial 157k-edge hash-min loop). ``pin`` fixes that
    with an eager localCheckpoint, but that is one extra JOB per
    generation. ``fast_pin`` gets the O(1) logical plan without the job:
    ``queryExecution.toRdd()`` compiles the plan to its RDD (no action),
    and ``internalCreateDataFrame`` wraps it as a stats-fresh LogicalRDD
    leaf — the same construction as ``pin``'s fallback path, minus the
    materialization.

    Contract: call it on a *cached* DataFrame. The RDD still reads (and
    on first use populates) the cache, so referencing the result twice
    costs one computation; the RDD lineage keeps growing until a real
    ``pin`` truncates it, so iterative kernels still pin every
    ``checkpoint_every`` generations (the _StateChain cadence).
    """
    try:
        jdf = df._jdf  # type: ignore[attr-defined]
        jrdd = jdf.queryExecution().toRdd()
        jschema = jdf.schema()
        jss = df.sparkSession._jsparkSession  # type: ignore[attr-defined]
        fresh = jss.internalCreateDataFrame(jrdd, jschema, False)
        return DataFrame(fresh, df.sparkSession)
    except Exception:  # pragma: no cover - non-classic sessions (Connect)
        return df


def pin(df: DataFrame, *, hash_cols: tuple[str, ...] | None = None) -> DataFrame:
    """Eagerly materialize ``df``, truncate lineage, and reset plan stats.

    The rebuilt ``LogicalRDD`` is a case-class ``copy`` of the checkpoint's
    own plan with ``originStats``/``originConstraints`` dropped: stats reset
    to the conf default (O(1) bits per generation), while everything the
    checkpoint captured — output attributes, ``outputPartitioning``,
    ``outputOrdering`` — carries through, so a consumer keyed on the same
    columns can reuse the materialized layout instead of re-exchanging the
    state side.

    Measured caveat (Spark 4.1, recorded in BASELINE.md r5): with AQE
    enabled (the engine default) ``Dataset.localCheckpoint`` itself captures
    ``UnknownPartitioning`` — the adaptive physical root does not expose the
    final partitioning at checkpoint time — so under AQE this preserves
    nothing and the (small, O(n)-row) state side re-exchanges per superstep,
    exactly as with a bare checkpoint. With AQE off the partitioning is
    captured and reused (explain-asserted in tests). The engine's explain
    assertions (scripts/explain_plans.py) pin down that the *edge* side —
    the O(m) relation — never re-exchanges either way.
    """
    global _warned_fallback
    ck = df.localCheckpoint(eager=True)
    try:
        sess = ck.sparkSession
        jvm = sess._jvm  # type: ignore[attr-defined]
        lr = ck._jdf.queryExecution().analyzed()  # type: ignore[attr-defined]
        none = getattr(getattr(jvm.scala, "None$"), "MODULE$")
        partitioning = lr.outputPartitioning()
        ordering = lr.outputOrdering()
        if hash_cols:
            # Declare HashPartitioning over the LEAF'S OWN output attrs
            # (r6). The checkpoint's captured partitioning is useless for
            # join-exchange elision in practice: under AQE it is
            # UnknownPartitioning, and even when captured its expressions
            # reference the EXECUTED plan's attribute ids, which do not
            # match the rebuilt leaf's output ids — so EnsureRequirements
            # re-exchanges the pinned table at every superstep join (the
            # round-6 explain gate caught exactly this). The caller
            # asserts the rows really are hash-partitioned by these
            # columns (a preceding repartition(N, cols)); hash
            # partitioning is a pure function of the VALUES, so the
            # declaration stays valid across the attr-id rewrite. N is
            # read from the checkpointed RDD itself.
            out = lr.output()
            by_name = {out.apply(i).name(): out.apply(i) for i in range(out.size())}
            to_seq = jvm.org.apache.spark.api.python.PythonUtils.toSeq
            partitioning = jvm.org.apache.spark.sql.catalyst.plans.physical.HashPartitioning(
                to_seq([by_name[c] for c in hash_cols]),
                lr.rdd().getNumPartitions(),
            )
            ordering = to_seq([])
        fresh = lr.copy(
            lr.output(), lr.rdd(), partitioning, ordering,
            lr.isStreaming(), lr.stream(), sess._jsparkSession, none, none,
        )
        jds = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            sess._jsparkSession, fresh
        )
        return DataFrame(jds, sess)
    except Exception:
        if hash_cols:
            raise  # the caller relies on the declared layout — fail loud
        pass
    try:
        # Older fallback: rebuild over the checkpointed RDD (stats reset,
        # partitioning dropped) — covers a non-LogicalRDD analyzed plan.
        jdf = ck._jdf  # type: ignore[attr-defined]
        jrdd = jdf.queryExecution().toRdd()
        jschema = jdf.schema()
        jss = ck.sparkSession._jsparkSession  # type: ignore[attr-defined]
        fresh = jss.internalCreateDataFrame(jrdd, jschema, False)
        return DataFrame(fresh, ck.sparkSession)
    except Exception:  # pragma: no cover - non-classic sessions (Connect)
        if not _warned_fallback:
            _warned_fallback = True
            _log.warning(
                "pin: stats-reset rebuild unavailable (non-classic session?); "
                "falling back to bare localCheckpoint — deep iterative plans "
                "may hit the Spark 4 inherited-stats planning blowup "
                "(see plans/lineage.py docstring)"
            )
        return ck
