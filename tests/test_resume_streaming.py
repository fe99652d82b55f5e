"""Resumability (north_rule: identical result after restart-from-checkpoint)
and Structured Streaming rollup tests."""

from __future__ import annotations

import math
import shutil

from pasgal_spark.plans import CheckpointedPageRank, RunManifest
from pasgal_spark.streaming import (
    read_event_stream,
    run_to_memory_sink,
    windowed_event_counts,
)
from tests.conftest import edges_df, vertices_df
from tests.oracles import pagerank_oracle

EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (1, 3)]
N = 6  # vertex 5 isolated + dangling


def test_checkpointed_pagerank_resume_identical(spark, tmp_path):
    edges = edges_df(spark, EDGES)
    verts = vertices_df(spark, range(N))

    # uninterrupted run
    full_dir = str(tmp_path / "full")
    full = CheckpointedPageRank(
        spark, edges, verts, full_dir, checkpoint_every=2
    ).run(tol=1e-5)
    full_ranks = dict(full.collect())

    # interrupted run: stop after 3 supersteps (manifest at superstep 2)
    part_dir = str(tmp_path / "part")
    cp = CheckpointedPageRank(spark, edges, verts, part_dir, checkpoint_every=2)
    cp.run(tol=1e-5, max_supersteps=3)
    m = RunManifest.load(part_dir)
    assert m is not None and m.superstep == 2

    # "crash": new object over the same workdir resumes from the manifest
    resumed = CheckpointedPageRank(
        spark, edges, verts, part_dir, checkpoint_every=2
    ).run(tol=1e-5)
    resumed_ranks = dict(resumed.collect())

    assert all(
        math.isclose(full_ranks[u], resumed_ranks[u], abs_tol=1e-12) for u in range(N)
    )
    # and both match the sequential oracle
    exp = pagerank_oracle(N, EDGES, tol=1e-5)
    assert all(math.isclose(full_ranks[u], exp[u], abs_tol=1e-4) for u in range(N))


def test_metrics_record_per_partition_lineage(spark, tmp_path):
    edges = edges_df(spark, EDGES)
    verts = vertices_df(spark, range(N))
    cp = CheckpointedPageRank(spark, edges, verts, str(tmp_path / "m"))
    cp.run(tol=1e-3)
    m = cp.metrics().toPandas()
    assert {"run_id", "superstep", "partition_id", "rows", "delta", "wall_ms"} <= set(
        m.columns
    )
    assert m["superstep"].max() >= 2
    # lineage: per-superstep partition rows sum to the vertex count
    per_step = m.groupby("superstep")["rows"].sum()
    assert (per_step == N).all()
    # convergence metric is monotone-ish decreasing overall
    deltas = m.groupby("superstep")["delta"].first()
    assert deltas.iloc[-1] < deltas.iloc[0]


def test_streaming_rollup_matches_batch(spark, sf_dir, tmp_path):
    # stage the events parquet as a stream source directory
    src = str(tmp_path / "stream_src")
    spark.read.parquet(f"{sf_dir}/events.parquet").coalesce(4).write.parquet(src)

    stream = read_event_stream(spark, src)
    got = run_to_memory_sink(windowed_event_counts(stream), "rollup_test")

    batch = (
        spark.read.parquet(src)
        .groupBy(
            __import__("pyspark.sql.functions", fromlist=["window"]).window("ts", "1 hour"),
            "event_type",
        )
        .count()
    )
    assert got.count() == batch.count()
    assert got.agg({"n": "sum"}).first()[0] == spark.read.parquet(src).count()
