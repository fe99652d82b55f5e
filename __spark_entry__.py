"""Driver contract for the spark-graft builder (PySpark target).

Engine: ``pasgal_spark`` — a PySpark-native link-graph analytics engine with
the capabilities of ucrparlay/PASGAL (see SURVEY.md). Queries below derive a
deterministic link graph from the driver's TPC-H-ish tables via portable SQL
(``pasgal_spark.graph.builder.GRAPH_CTE`` — runs identically under Spark SQL
and DuckDB), then run the engine's DataFrame kernels; each oracle rebuilds
the same graph in DuckDB and recomputes the kernel with recursive CTEs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pasgal_spark.graph import build_graph, kernels
from pasgal_spark.graph.builder import GRAPH_CTE, LinkGraph

# ---------------------------------------------------------------------------
# graph cache (one derivation per sf_dir per session)
# ---------------------------------------------------------------------------

_GRAPH_CACHE: dict[str, LinkGraph] = {}


def _graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    g = _GRAPH_CACHE.get(sf_dir)
    if g is None or g.edges.sparkSession is not spark:
        g = build_graph(spark, sf_dir, partitions=None)
        _GRAPH_CACHE[sf_dir] = g
    return g


# Kernel parameters shared by Spark queries and DuckDB oracles.
PR_ITERS = 15
PR_DAMPING = 0.85
LP_ROUNDS = 3  # keeps the DuckDB ball-closure oracle fast at sf0.01
BFS_MAXD = 30
SSSP_CAP = 40


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank over the link graph derived from sf0.001."""
    g = _graph(spark, "/root/testdata/sf0.001")
    pr = kernels.pagerank(
        g.edges, g.vertices, iterations=PR_ITERS, damping=PR_DAMPING
    )
    return pr.select("id", F.round("rank", 6).alias("rank")).orderBy("id")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_degree_analytics(spark: SparkSession, sf: str) -> DataFrame:
    g = _graph(spark, sf)
    return kernels.degree_analytics(g.edges, g.vertices)


def _q_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    g = _graph(spark, sf)
    pr = kernels.pagerank(
        g.edges, g.vertices, iterations=PR_ITERS, damping=PR_DAMPING
    )
    return pr.select("id", F.round("rank", 6).alias("rank"))


def _q_cc(spark: SparkSession, sf: str) -> DataFrame:
    g = _graph(spark, sf)
    return kernels.connected_components(g.sym, g.vertices)


def _q_largest_cc(spark: SparkSession, sf: str) -> DataFrame:
    g = _graph(spark, sf)
    return kernels.largest_component(
        kernels.connected_components(g.sym, g.vertices)
    )


def _q_cc_histogram(spark: SparkSession, sf: str) -> DataFrame:
    g = _graph(spark, sf)
    return kernels.component_histogram(
        kernels.connected_components(g.sym, g.vertices)
    )


def _q_label_propagation(spark: SparkSession, sf: str) -> DataFrame:
    g = _graph(spark, sf)
    return kernels.label_propagation(g.sym, g.vertices, rounds=LP_ROUNDS)


def _q_bfs(spark: SparkSession, sf: str) -> DataFrame:
    g = _graph(spark, sf)
    return kernels.bfs(g.sym, source=0, max_depth=BFS_MAXD)


def _q_sssp(spark: SparkSession, sf: str) -> DataFrame:
    g = _graph(spark, sf)
    return kernels.sssp(g.wedges, source=0, cap=SSSP_CAP)


def _q_triangles(spark: SparkSession, sf: str) -> DataFrame:
    g = _graph(spark, sf)
    return kernels.triangle_count(g.sym)


def _q_symmetrize(spark: SparkSession, sf: str) -> DataFrame:
    g = _graph(spark, sf)
    return g.sym


def _q_in_degree(spark: SparkSession, sf: str) -> DataFrame:
    g = _graph(spark, sf)
    from pasgal_spark.graph.builder import transpose

    t = transpose(g.edges)
    return t.groupBy("src").agg(F.count(F.lit(1)).alias("in_deg")).withColumnRenamed(
        "src", "id"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "degree_analytics": _q_degree_analytics,
        "pagerank": _q_pagerank,
        "connected_components": _q_cc,
        "largest_cc": _q_largest_cc,
        "cc_histogram": _q_cc_histogram,
        "label_propagation": _q_label_propagation,
        "bfs": _q_bfs,
        "sssp": _q_sssp,
        "triangle_count": _q_triangles,
        "symmetrize": _q_symmetrize,
        "in_degree": _q_in_degree,
    }


# ---------------------------------------------------------------------------
# oracles (DuckDB SQL) — rebuild the identical graph + recompute each kernel
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    C = GRAPH_CTE
    return {
        "degree_analytics": f"""
            WITH {C},
            outd AS (SELECT v.id, count(e.src) AS d FROM vertices v
                     LEFT JOIN edges e ON v.id = e.src GROUP BY v.id),
            ind AS (SELECT v.id, count(e.dst) AS d FROM vertices v
                    LEFT JOIN edges e ON v.id = e.dst GROUP BY v.id)
            SELECT (SELECT count(*) FROM vertices) AS n,
                   (SELECT count(*) FROM edges) AS m,
                   (SELECT max(d) FROM outd) AS max_out_deg,
                   (SELECT count(*) FROM outd WHERE d = 0) AS zero_out_deg,
                   (SELECT max(d) FROM ind) AS max_in_deg,
                   (SELECT count(*) FROM ind WHERE d = 0) AS zero_in_deg
        """,
        "pagerank": f"""
            WITH RECURSIVE {C},
            deg AS (SELECT src AS id, count(*) AS out_deg FROM edges GROUP BY src),
            nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM vertices),
            routes AS (
              SELECT e.src AS id, e.dst AS tgt,
                     1.0 / d.out_deg AS w
              FROM edges e JOIN deg d ON e.src = d.id
              UNION ALL
              SELECT dv.id, v.id AS tgt, 1.0 / (SELECT n FROM nv) AS w
              FROM (SELECT v2.id FROM vertices v2 LEFT JOIN deg ON v2.id = deg.id
                    WHERE deg.id IS NULL) dv
              CROSS JOIN vertices v
              UNION ALL
              SELECT v.id, v.id AS tgt, 0.0 AS w FROM vertices v
            ),
            pr(it, id, rank) AS (
              SELECT 0, id, 1.0 / (SELECT n FROM nv) FROM vertices
              UNION ALL
              SELECT pr.it + 1, r.tgt,
                     (1.0 - {PR_DAMPING}) / (SELECT n FROM nv)
                     + {PR_DAMPING} * sum(pr.rank * r.w)
              FROM pr JOIN routes r ON pr.id = r.id
              WHERE pr.it < {PR_ITERS}
              GROUP BY pr.it, r.tgt
            )
            SELECT id, round(rank, 6) AS rank FROM pr WHERE it = {PR_ITERS}
        """,
        "connected_components": f"""
            WITH RECURSIVE {C},
            reach(id, lbl) AS (
              SELECT id, id FROM vertices
              UNION
              SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.id
            )
            SELECT id, min(lbl) AS component FROM reach GROUP BY id
        """,
        "largest_cc": f"""
            WITH RECURSIVE {C},
            reach(id, lbl) AS (
              SELECT id, id FROM vertices
              UNION
              SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.id
            ),
            comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id)
            SELECT component, count(*) AS size FROM comp GROUP BY component
            ORDER BY size DESC, component ASC LIMIT 1
        """,
        "cc_histogram": f"""
            WITH RECURSIVE {C},
            reach(id, lbl) AS (
              SELECT id, id FROM vertices
              UNION
              SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.id
            ),
            comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id)
            SELECT component, count(*) AS size FROM comp GROUP BY component
        """,
        "label_propagation": f"""
            WITH RECURSIVE {C},
            nb(id, lbl, d) AS (
              SELECT id, id, 0 FROM vertices
              UNION
              SELECT s.dst, n.lbl, n.d + 1 FROM nb n JOIN sym s ON s.src = n.id
              WHERE n.d < {LP_ROUNDS}
            )
            SELECT id, min(lbl) AS label FROM nb GROUP BY id
        """,
        "bfs": f"""
            WITH RECURSIVE {C},
            r(id, d) AS (
              SELECT CAST(0 AS BIGINT), 0
              UNION
              SELECT s.dst, r.d + 1 FROM r JOIN sym s ON s.src = r.id
              WHERE r.d < {BFS_MAXD}
            )
            SELECT id, CAST(min(d) AS INT) AS dist FROM r GROUP BY id
        """,
        "sssp": f"""
            WITH RECURSIVE {C},
            r(id, d) AS (
              SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
              UNION
              SELECT w.dst, r.d + w.w FROM r JOIN wedges w ON w.src = r.id
              WHERE r.d + w.w <= {SSSP_CAP}
            )
            SELECT id, min(d) AS dist FROM r GROUP BY id
        """,
        "triangle_count": f"""
            WITH {C},
            e AS (SELECT src, dst FROM sym WHERE src < dst)
            SELECT count(*) AS triangles
            FROM e a JOIN e b ON b.src = a.dst
            JOIN e c ON c.src = a.src AND c.dst = b.dst
        """,
        "symmetrize": f"""
            WITH {C} SELECT src, dst FROM sym
        """,
        "in_degree": f"""
            WITH {C}
            SELECT dst AS id, count(*) AS in_deg FROM edges GROUP BY dst
        """,
    }
