"""r06 measurement harness: per-query wall + Spark JOB COUNT.

The frozen bench.py times the queries; what it cannot show is WHY an
iterative kernel is slow at small sf — the answer is per-superstep fixed
overhead, i.e. the number of driver actions (jobs) each query launches.
This harness runs the same queries with a job group per query and reports
(wall_sec, n_jobs, n_stages) so each r06 optimization's job-count claim is
measurable (guide §1: measure first; §1.5: label your jobs).

Run: SPARK_GRAFT_SF_DIR=... python bench_extra.py [query ...]
Prints one JSON line: {"queries": {name: {"wall": s, "jobs": n, "stages": n}}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pasgal_spark.session import get_spark  # noqa: E402
from pasgal_spark.graph import build_graph, kernels  # noqa: E402
from pasgal_spark.graph import bcc as bccmod  # noqa: E402
from pasgal_spark.functions import dedup, similarity  # noqa: E402
from pasgal_spark.graph.builder import load_views  # noqa: E402
from pasgal_spark.plans.lineage import pin  # noqa: E402
from pasgal_spark.sources.extract import extract_links, links_to_edges  # noqa: E402
from pasgal_spark.sources.pages import synthesize_pages  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "2"))
    spark = get_spark(
        app_name="pasgal-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
    )
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    g = build_graph(spark, sf_dir, partitions=max(cpus // 2, 8))
    g.edges.count()
    g.sym.count()
    load_views(spark, sf_dir, ["documents", "embeddings"])
    c = dedup.corpus(spark, sf_dir)
    emb = spark.table("embeddings")
    sparse_sym = pin(
        g.sym.filter("(least(src, dst) * 31 + greatest(src, dst) * 17) % 8 = 0")
    )

    def _pipeline():
        pages = synthesize_pages(spark, 50_000)
        links_to_edges(extract_links(pages)).count()

    queries = {
        "pagerank_1e6": lambda: kernels.pagerank(g.edges, g.vertices, tol=1e-6)
        .select("id")
        .count(),
        "connected_components": lambda: kernels.connected_components_two_phase(
            g.sym, g.vertices
        )
        .select("component")
        .distinct()
        .count(),
        "connected_components_hashmin": lambda: kernels.connected_components(
            g.sym, g.vertices
        )
        .select("component")
        .distinct()
        .count(),
        "label_propagation": lambda: kernels.label_propagation(
            g.sym, g.vertices, rounds=4
        ).count(),
        "triangle_count": lambda: kernels.triangle_count(g.sym).collect(),
        "bfs": lambda: kernels.bfs(
            g.sym, 0, max_depth=30, vertices=g.vertices
        ).count(),
        "extract_pipeline_50k_pages": _pipeline,
        "bcc_summary_euler": lambda: bccmod.bcc_summary(
            sparse_sym, g.vertices, strategy="euler"
        ).collect(),
        "minhash_lsh_jaccard": lambda: dedup.near_dup_pipeline(c).count(),
        "cosine_topk": lambda: similarity.cosine_topk(emb).count(),
        "bucketed_ann": lambda: similarity.bucketed_ann(emb).count(),
        "sssp": lambda: kernels.sssp(g.wedges, 0, cap=40).count(),
        "sssp_delta_stepping": lambda: kernels.sssp_delta_stepping(
            g.wedges, 0, delta=8, cap=40
        ).count(),
        "sssp_rho_stepping": lambda: kernels.sssp_rho_stepping(
            g.wedges, 0, rho=256, cap=40
        ).count(),
    }
    wanted = sys.argv[1:] or list(queries)

    out = {}
    for name in wanted:
        fn = queries[name]
        best = None
        for _ in range(trials):
            group = f"bx-{name}-{time.monotonic_ns()}"
            sc.setJobGroup(group, name)
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            fn()
            wall = round(time.time() - t0, 3)
            jobs = tracker.getJobIdsForGroup(group)
            n_stages = sum(
                len(tracker.getJobInfo(j).stageIds)
                for j in jobs
                if tracker.getJobInfo(j) is not None
            )
            cur = {"wall": wall, "jobs": len(jobs), "stages": n_stages}
            if best is None or cur["wall"] < best["wall"]:
                best = cur
        out[name] = best
    print(json.dumps({"sf": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
