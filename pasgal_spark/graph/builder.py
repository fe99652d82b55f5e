"""Canonical link-graph derivation + graph transform operators.

The engine's unit of data is an **edge DataFrame** ``(src: long, dst: long)``
— the Spark translation of the reference's CSR ``Graph`` abstraction
(reference: src/graph.h:53-69). The CSR offsets/edges arrays become a
partitioned relation; the transpose (src/graph.h:84-110 ``make_inverse``)
becomes a column swap + re-shuffle; symmetrization (src/graph.h:476-504)
becomes union+distinct.

For the driver's correctness harness the graph is *derived* from the
driver-provided TPC-H-ish tables by deterministic, portable SQL
(``GRAPH_CTE``) that runs identically under Spark SQL and DuckDB — the same
determinism-by-hashing idiom the reference uses for synthetic graphs
(src/graph.h:397-433: edges from ``hash32(i)``, no RNG state). A guaranteed
hub vertex 0 (every 17th order links to it) is the skew fixture, mirroring
FIXTURES.md F2.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Portable SQL (Spark SQL ∩ DuckDB) defining the canonical graph.  Vertex
# universe = customer ids shifted to 0..n-1 (dense ints, like the reference's
# NodeId space).  Directed edges: each order links its customer to a
# hash-derived target; every 17th order also links to hub vertex 0
# (the power-law/skew regression fixture).  `sym` is the symmetrized view
# used by the undirected kernels (CC / LP / triangles), `wedges` adds
# deterministic weights w(u,v) = (31u+17v) mod 8 + 1 — the reference's
# hash-weight idiom (src/graph.h:309-327).
GRAPH_CTE = """
graph_params AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM customer
),
edges_raw AS (
  SELECT CAST(o_custkey % (SELECT n FROM graph_params) AS BIGINT) AS src,
         CAST((o_orderkey * 2654435761 + 7) % (SELECT n FROM graph_params) AS BIGINT) AS dst
  FROM orders
  UNION ALL
  SELECT CAST(o_custkey % (SELECT n FROM graph_params) AS BIGINT) AS src,
         CAST(0 AS BIGINT) AS dst
  FROM orders
  WHERE o_orderkey % 17 = 0
),
edges AS (
  SELECT DISTINCT src, dst FROM edges_raw WHERE src <> dst
),
vertices AS (
  SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
),
sym AS (
  SELECT src, dst FROM edges
  UNION
  SELECT dst AS src, src AS dst FROM edges
),
wedges AS (
  SELECT src, dst, CAST((src * 31 + dst * 17) % 8 + 1 AS BIGINT) AS w FROM sym
)
"""


def load_views(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> None:
    """Register driver-provided parquet tables as temp views (only the ones
    requested — each registration costs a schema-read job)."""
    for name in tables or TPCH_TABLES:
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)


@dataclass
class LinkGraph:
    """Edge-table graph handle: directed edges, symmetrized view, vertices.

    ``edges`` is repartitioned by ``src`` (the analog of CSR row grouping:
    all out-edges of a vertex co-located) so iterative kernels join the
    per-vertex state against a stable partitioning and only the small state
    side moves each superstep.
    """

    edges: DataFrame       # (src, dst) directed, deduped, no self-loops
    sym: DataFrame         # symmetrized, deduped
    vertices: DataFrame    # (id) full vertex universe incl. isolated vertices
    wedges: DataFrame      # (src, dst, w) weighted symmetric edges

    @property
    def spark(self) -> SparkSession:
        return self.edges.sparkSession


def build_graph(
    spark: SparkSession,
    sf_dir: str,
    *,
    partitions: int | None = None,
    cache: bool = True,
) -> LinkGraph:
    """Derive the canonical graph from the parquet tables at ``sf_dir``."""
    load_views(spark, sf_dir, ["customer", "orders"])

    def q(body: str) -> DataFrame:
        return spark.sql(f"WITH {GRAPH_CTE} {body}")

    edges = q("SELECT src, dst FROM edges")
    sym = q("SELECT src, dst FROM sym")
    vertices = q("SELECT id FROM vertices")
    wedges = q("SELECT src, dst, w FROM wedges")

    if partitions:
        # Range-partition by src: the big-fanout shuffle key for every
        # superstep join (north_rule: explicit partitioning of the edge
        # table).  On a cluster this would be a bucketed table.
        edges = edges.repartitionByRange(partitions, "src")
        sym = sym.repartitionByRange(partitions, "src")
        wedges = wedges.repartitionByRange(partitions, "src")
    if cache:
        edges.cache()
        sym.cache()
        vertices.cache()
        # wedges feeds every SSSP superstep's relax join — uncached it
        # re-derives from the orders parquet (scan+union+distinct) per step.
        wedges.cache()
    return LinkGraph(edges=edges, sym=sym, vertices=vertices, wedges=wedges)


# ---------------------------------------------------------------------------
# Graph transform operators (reference §2B)
# ---------------------------------------------------------------------------

def transpose(edges: DataFrame) -> DataFrame:
    """Transpose: in-edges view (reference ``make_inverse`` src/graph.h:84-110).

    The sort-scatter of the reference becomes a column swap; the shuffle that
    re-clusters by the new src happens lazily at the next key-dependent op.
    """
    return edges.select(
        edges.dst.alias("src"), edges.src.alias("dst")
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Union with reversed edges, drop self-loops + dups
    (reference ``make_symmetrized`` src/graph.h:476-504)."""
    return (
        edges.union(transpose(edges))
        .filter("src <> dst")
        .distinct()
    )


def validate(edges: DataFrame, n: int) -> dict[str, int]:
    """Sanity assertions on an edge table (reference src/graph.h:349-395):
    endpoint range, self-loop count, duplicate count. Returns violation
    counts (all zero for a valid deduped graph)."""
    from pyspark.sql import functions as F

    out_of_range = edges.filter((F.col("src") < 0) | (F.col("src") >= n)
                                | (F.col("dst") < 0) | (F.col("dst") >= n)).count()
    self_loops = edges.filter("src = dst").count()
    dups = (
        edges.groupBy("src", "dst").count().filter("count > 1").count()
    )
    return {"out_of_range": out_of_range, "self_loops": self_loops, "dups": dups}
