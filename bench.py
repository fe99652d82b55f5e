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
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pasgal_spark.session import get_spark  # noqa: E402
from pasgal_spark.graph import build_graph, kernels  # noqa: E402
from pasgal_spark.functions import dedup, similarity  # noqa: E402
from pasgal_spark.graph.builder import load_views  # noqa: E402
from pasgal_spark.sources.extract import extract_links, links_to_edges  # noqa: E402
from pasgal_spark.sources.pages import synthesize_pages  # noqa: E402


# Clean-window fully-JIT-warm min wall for the sentinel on this box
# (local[32], measured r5: 0.24-0.51 across clean sessions). A window's
# inflation factor = min(before+after sentinel walls) / nominal; the
# co-tenant spikes this flags run 2-10x, so ±50% calibration slack is
# irrelevant — BENCH artifacts captured under load become self-documenting
# (VERDICT r4 adjudicated a 36% "regression" that was pure window noise).
SENTINEL_NOMINAL_SEC = 0.3


def noise_sentinel(spark, trials: int = 3) -> list[float]:
    """Fixed pure-JVM microbenchmark (the r2 xxhash64 reproducer shape:
    range scan + 4 chained xxhash64 + local max — no shuffle, no Python,
    no disk; max instead of sum so ANSI mode can't overflow). Its wall is
    a pure function of available CPU, so running it before and after the
    suite stamps each BENCH artifact with the window's co-tenant
    inflation factor."""
    from pyspark.sql import functions as F

    def _run(n_rows: int) -> None:
        h = F.col("id")
        for s in range(4):
            h = F.xxhash64(h, F.lit(s))
        spark.range(n_rows).select(h.alias("h")).agg(F.max("h")).collect()

    _run(1_000)  # untimed: JIT/codegen warmup for this query shape
    walls = []
    for _ in range(trials):
        t0 = time.time()
        _run(50_000_000)
        walls.append(round(time.time() - t0, 3))
    return walls


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

    # Per-query timeout (seconds; 0 = off). Used at the big tiers (sf10)
    # so one pathological query can't eat the whole gate; a timed-out
    # query records the timeout value and lands in "timed_out".
    query_timeout = float(os.environ.get("SPARK_GRAFT_QUERY_TIMEOUT", "0"))

    sentinel_before = noise_sentinel(spark)

    timings: dict[str, float] = {}
    all_trials: dict[str, list[float]] = {}
    timed_out: list[str] = []
    pr_detail: dict[str, float] = {}

    def _run_bounded(name: str, fn) -> bool:
        """Run fn; on timeout cancel its job group and return False."""
        if not query_timeout:
            fn()
            return True
        sc = spark.sparkContext
        group = f"bench-{name}"
        errs: list[BaseException] = []

        def _target():
            # setJobGroup is thread-local, so every job fn launches from
            # this thread (including iterative kernels' supersteps) lands
            # in the cancellable group.
            sc.setJobGroup(group, name, interruptOnCancel=True)
            try:
                fn()
            except BaseException as e:  # noqa: BLE001 - surfaced below
                errs.append(e)

        t = threading.Thread(target=_target, daemon=True)
        t.start()
        t.join(query_timeout)
        if t.is_alive():
            sc.cancelJobGroup(group)
            t.join(30)
            return False
        if errs:
            raise errs[0]
        return True

    def timed(name, fn):
        walls = []
        for _ in range(trials):
            t0 = time.time()
            if not _run_bounded(name, fn):
                timed_out.append(name)
                # min-of-trials contract: a completed trial's wall beats
                # the timeout sentinel (a later flaky-window hang must not
                # overwrite a real measurement with a phantom regression)
                timings[name] = min(walls) if walls else round(query_timeout, 3)
                all_trials[name] = walls + [round(query_timeout, 3)]
                return
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
    # brute-force cosine top-k is the *baseline* (definitionally quadratic:
    # every query row scans the full corpus) — bucketed_ann is the scale
    # path (LSH-bucketed Gram kernels, cost Σ bucket² not n²); bench both
    # so the crossover is visible per tier.
    timed("cosine_topk", lambda: similarity.cosine_topk(emb).count())
    timed("bucketed_ann", lambda: similarity.bucketed_ann(emb).count())

    sentinel_after = noise_sentinel(spark)
    sentinel_min = min(sentinel_before + sentinel_after)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "trials": all_trials,
                "timed_out": timed_out,
                "sf": sf,
                # BASELINE.json headline: edges-processed/sec per superstep,
                # PageRank to 1e-6 convergence
                "pagerank": pr_detail,
                # Window-noise stamp: pure-JVM fixed microbenchmark before/
                # after the suite; inflation ~1.0 means a clean window,
                # >>1 means co-tenant load ate the measurements.
                "noise_sentinel": {
                    "before_sec": sentinel_before,
                    "after_sec": sentinel_after,
                    "nominal_sec": SENTINEL_NOMINAL_SEC,
                    "inflation": round(sentinel_min / SENTINEL_NOMINAL_SEC, 2),
                    # per-phase stamps: a window can start loaded and clear
                    # mid-suite (measured r5: before 4.8x, after 0.8x — the
                    # combined min alone would have read as clean while the
                    # first queries ran inflated)
                    "inflation_before": round(
                        min(sentinel_before) / SENTINEL_NOMINAL_SEC, 2
                    ),
                    "inflation_after": round(
                        min(sentinel_after) / SENTINEL_NOMINAL_SEC, 2
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
