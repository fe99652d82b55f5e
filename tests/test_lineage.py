"""pin() — lineage truncation with stats reset + partitioning carry.

The r5 rebuild path (plans/lineage.py) copies the checkpoint's own
LogicalRDD minus originStats, so stats reset to the conf default while a
captured outputPartitioning survives. Spark 4.1 caveat pinned here: the
checkpoint only *captures* a partitioning when AQE is off; under AQE the
adaptive root reports UnknownPartitioning at checkpoint time.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pasgal_spark.plans.lineage import pin
from tests.conftest import edges_df


def _analyzed(df):
    return df._jdf.queryExecution().analyzed()


def test_pin_preserves_values_and_schema(spark):
    df = edges_df(spark, [(0, 1), (1, 2), (2, 0)]).withColumn(
        "w", F.col("src") * 10 + F.col("dst")
    )
    p = pin(df)
    assert p.schema == df.schema
    assert sorted(p.collect()) == sorted(df.collect())


def test_pin_resets_inherited_stats(spark):
    # Self-join doubles the carried sizeInBytes bit length per generation
    # when stats are inherited; pin must reset to the conf default.
    default_size = int(spark.conf.get("spark.sql.defaultSizeInBytes"))
    df = edges_df(spark, [(0, 1), (1, 2)])
    gen = pin(df)
    for _ in range(3):
        nxt = gen.alias("a").join(gen.alias("b"), "src").select(
            F.col("a.src"), F.col("a.dst")
        )
        gen = pin(nxt)
    size = int(str(_analyzed(gen).stats().sizeInBytes()))
    assert size == default_size


def test_pin_carries_captured_partitioning_when_aqe_off(spark):
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = (
            spark.range(200)
            .select((F.col("id") % 13).alias("k"), F.col("id").alias("v"))
            .repartition(4, "k")
        )
        p = pin(df)
        part = _analyzed(p).outputPartitioning().toString()
        assert "hashpartitioning(k" in part, part
        # A same-key aggregation reuses the materialized layout: no Exchange.
        agg = p.groupBy("k").agg(F.sum("v").alias("s"))
        agg.collect()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_pin_under_aqe_checkpoint_captures_unknown(spark):
    # Documents (and alerts on change of) the Spark 4.1 behavior that makes
    # the AQE path re-exchange state: the checkpoint itself captures
    # UnknownPartitioning, so there is nothing for pin to preserve. If a
    # Spark upgrade starts capturing it, this test fails and the BASELINE
    # note should flip to "partitioning reused under AQE too".
    df = (
        spark.range(100)
        .select((F.col("id") % 7).alias("k"), F.col("id").alias("v"))
        .repartition(4, "k")
    )
    bare = df.localCheckpoint(eager=True)
    part = _analyzed(bare).outputPartitioning().toString()
    assert "UnknownPartitioning" in part, part
