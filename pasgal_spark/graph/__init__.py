from pasgal_spark.graph.builder import (  # noqa: F401
    GRAPH_CTE,
    LinkGraph,
    load_views,
    build_graph,
)
from pasgal_spark.graph import kernels  # noqa: F401
