"""Synthetic generator fixtures (reference generators parity)."""

from __future__ import annotations

from pasgal_spark.graph import kernels
from pasgal_spark.graph.builder import symmetrize
from pasgal_spark.sources import generators


def test_random_graph_deterministic(spark):
    a = sorted(tuple(r) for r in generators.random_graph(spark, 50, 200).collect())
    b = sorted(tuple(r) for r in generators.random_graph(spark, 50, 200).collect())
    assert a == b and len(a) > 100
    assert all(0 <= u < 50 and 0 <= v < 50 and u != v for u, v in a)


def test_grid_long_diameter_bfs(spark):
    # 2 x 8 non-torus grid: connected, diameter >= cols-1
    edges = generators.grid_graph(spark, 2, 8, torus=False)
    sym = symmetrize(edges)
    verts = spark.range(16).withColumnRenamed("id", "id")
    cc = kernels.connected_components(sym, verts)
    assert cc.select("component").distinct().count() == 1
    dist = dict(kernels.bfs(sym, source=0, max_depth=30).collect())
    assert max(dist.values()) >= 7


def test_torus_wraps(spark):
    edges = generators.grid_graph(spark, 3, 3, torus=True)
    sym = symmetrize(edges)
    # every vertex has exactly 4 torus neighbors
    deg = {r["src"]: r["count"] for r in sym.groupBy("src").count().collect()}
    assert all(d == 4 for d in deg.values()) and len(deg) == 9


def test_hash_weights_deterministic_and_ranged(spark):
    e = generators.random_graph(spark, 20, 60)
    w1 = sorted(tuple(r) for r in generators.with_hash_weights(e, low=1, rng=8).collect())
    w2 = sorted(tuple(r) for r in generators.with_hash_weights(e, low=1, rng=8).collect())
    assert w1 == w2
    assert all(1 <= w <= 8 for _, _, w in w1)
