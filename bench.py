"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": ...,
   "pagerank": {...edges/sec-per-superstep detail...}}

The headline metric follows BASELINE.json: edges-processed/sec per
superstep for PageRank run to 1e-6 convergence. Two-parallelism scaling
evidence lives in scripts/bench_scaling.py (separate JVMs per core count)
and is recorded in BASELINE.md / SCALING.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pasgal_spark.session import get_spark  # noqa: E402
from pasgal_spark.graph import build_graph, kernels  # noqa: E402
from pasgal_spark.functions import dedup, similarity  # noqa: E402
from pasgal_spark.graph.builder import load_views  # noqa: E402
from pasgal_spark.sources.extract import extract_links, links_to_edges  # noqa: E402
from pasgal_spark.sources.pages import synthesize_pages  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Sandbox VM wall-times carry 2-10x co-tenant spikes (BASELINE.md):
    # score the min of N trials per query, same protocol as SCALING.json.
    trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))
    spark = get_spark(
        app_name="pasgal-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
    )
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    g = build_graph(spark, sf_dir, partitions=max(cpus // 2, 8))
    m = g.edges.count()
    g.sym.count()

    timings: dict[str, float] = {}
    all_trials: dict[str, list[float]] = {}
    pr_detail: dict[str, float] = {}

    def timed(name, fn):
        walls = []
        for _ in range(trials):
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
        timings[name] = min(walls)
        all_trials[name] = walls

    # -- headline: PageRank to 1e-6 convergence ---------------------------
    pr_walls = []
    pr_runs = []
    for _ in range(trials):
        supersteps = []
        t0 = time.time()
        kernels.pagerank(
            g.edges, g.vertices, tol=1e-6,
            on_superstep=lambda i, d: supersteps.append(d),
        ).select("id").count()
        pr_walls.append(round(time.time() - t0, 3))
        pr_runs.append(supersteps)
    best = pr_walls.index(min(pr_walls))
    pr_wall = pr_walls[best]
    supersteps = pr_runs[best]
    timings["pagerank_1e6"] = pr_wall
    all_trials["pagerank_1e6"] = pr_walls
    pr_detail = {
        "edges": m,
        "supersteps": len(supersteps),
        "wall_sec": pr_wall,
        "edges_per_sec_per_superstep": round(m * len(supersteps) / pr_wall, 1),
        "final_delta": supersteps[-1] if supersteps else None,
    }

    # -- other kernels ------------------------------------------------------
    # CC both physical strategies: two-phase (fixed supersteps — the 100 TB
    # path) vs hash-min convergence (cheaper on small/shallow graphs); the
    # crossover is recorded in BASELINE.md (VERDICT r2 #3).
    timed("connected_components", lambda: kernels.connected_components_two_phase(g.sym, g.vertices).select("component").distinct().count())
    timed("connected_components_hashmin", lambda: kernels.connected_components(g.sym, g.vertices).select("component").distinct().count())
    timed("label_propagation", lambda: kernels.label_propagation(g.sym, g.vertices, rounds=4).count())
    timed("triangle_count", lambda: kernels.triangle_count(g.sym).collect())
    timed("bfs", lambda: kernels.bfs(g.sym, 0, max_depth=30, vertices=g.vertices).count())

    # -- web-text pipeline: synth pages -> extract -> edges ----------------
    def _pipeline():
        pages = synthesize_pages(spark, 50_000)
        links_to_edges(extract_links(pages)).count()

    timed("extract_pipeline_50k_pages", _pipeline)

    # -- BCC family (the r2 gap: only kernel family with no wall record) ---
    # Same ~12.5% symmetric-consistent sparse sample the driver queries use
    # (the canonical graph is 2-connected, a trivial BCC fixture), euler
    # strategy (diameter-safe O(log n) superstep path).
    from pasgal_spark.graph import bcc as bccmod  # noqa: E402
    from pasgal_spark.plans.lineage import pin  # noqa: E402

    sparse_sym = pin(
        g.sym.filter("(least(src, dst) * 31 + greatest(src, dst) * 17) % 8 = 0")
    )
    timed(
        "bcc_summary_euler",
        lambda: bccmod.bcc_summary(sparse_sym, g.vertices, strategy="euler").collect(),
    )

    # -- dedup + similarity -------------------------------------------------
    load_views(spark, sf_dir, ["documents", "embeddings"])
    c = dedup.corpus(spark, sf_dir)
    timed("minhash_lsh_jaccard", lambda: dedup.near_dup_pipeline(c).count())
    emb = spark.table("embeddings")
    timed("cosine_topk", lambda: similarity.cosine_topk(emb).count())

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "trials": all_trials,
                "sf": sf,
                # BASELINE.json headline: edges-processed/sec per superstep,
                # PageRank to 1e-6 convergence
                "pagerank": pr_detail,
            }
        )
    )


if __name__ == "__main__":
    main()
