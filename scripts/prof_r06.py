"""Round-6 follow-up profiler: per-superstep / per-stage walls for the
remaining hot bench queries. Measurement-only (not part of the bench
contract). Usage: python scripts/prof_r06.py [pagerank|bfs|bcc|minhash|triangle]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pasgal_spark.session import get_spark  # noqa: E402
from pasgal_spark.graph import build_graph, kernels  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="prof-r06",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
    )
    g = build_graph(spark, sf_dir, partitions=max(cpus // 2, 8))
    g.edges.count()
    g.sym.count()
    which = sys.argv[1] if len(sys.argv) > 1 else "pagerank"

    if which == "pagerank":
        for trial in range(3):
            marks = [time.time()]

            def cb(i, d):
                marks.append(time.time())

            t0 = time.time()
            kernels.pagerank(g.edges, g.vertices, tol=1e-6, on_superstep=cb).select(
                "id"
            ).count()
            wall = time.time() - t0
            steps = [round(marks[i + 1] - marks[i], 3) for i in range(len(marks) - 1)]
            print(f"trial {trial}: wall={wall:.3f} pre+steps={steps}")
    elif which == "bfs":
        for trial in range(3):
            marks = [time.time()]
            info = []

            def cb(d, mode, n):
                marks.append(time.time())
                info.append((d, mode, n))

            t0 = time.time()
            kernels.bfs(g.sym, 0, max_depth=30, vertices=g.vertices, on_superstep=cb).count()
            wall = time.time() - t0
            steps = [round(marks[i + 1] - marks[i], 3) for i in range(len(marks) - 1)]
            print(f"trial {trial}: wall={wall:.3f}")
            print("  levels:", [(i[0], i[1], i[2], s) for i, s in zip(info, steps)])
    elif which == "bcc":
        from pasgal_spark.graph import bcc as bccmod
        from pasgal_spark.graph.euler import boruvka_forest_cc, euler_tags, subtree_minmax
        from pasgal_spark.graph.bcc import bcc_edges, _fence_cc
        from pasgal_spark.plans.lineage import pin
        import pyspark.sql.functions as F

        sparse_sym = pin(
            g.sym.filter("(least(src, dst) * 31 + greatest(src, dst) * 17) % 8 = 0")
        )
        sparse_sym.count()
        for trial in range(3):
            t0 = time.time()
            forest, cc = boruvka_forest_cc(sparse_sym, g.vertices)
            t1 = time.time()
            tags = euler_tags(forest, cc)
            t2 = time.time()
            mm = subtree_minmax(tags, sparse_sym)
            t3 = time.time()
            n_cc = cc.select("component").distinct().count()
            t4 = time.time()
            e = bcc_edges(sparse_sym, g.vertices, cc=cc, tags=mm, strategy="euler")
            per = e.groupBy("bcc").agg(F.count(F.lit(1)).alias("n_edges"))
            agg = per.agg(
                F.count(F.lit(1)).alias("n_bcc"),
                F.max("n_edges").alias("largest"),
            ).collect()
            t5 = time.time()
            print(
                f"trial {trial}: total={t5-t0:.3f} boruvka={t1-t0:.3f} "
                f"euler_tags={t2-t1:.3f} minmax={t3-t2:.3f} n_cc={t4-t3:.3f} "
                f"edges+agg={t5-t4:.3f}"
            )
    elif which == "minhash":
        from pasgal_spark.functions import dedup
        from pasgal_spark.plans.lineage import pin

        c = dedup.corpus(spark, sf_dir)
        for trial in range(3):
            t0 = time.time()
            docs = c.cache()
            piv = dedup.minhash_pivot(docs).transform(pin)
            t1 = time.time()
            pairs = dedup.lsh_candidate_pairs(docs, piv).transform(pin)
            t2 = time.time()
            n = dedup.jaccard_verify(docs, pairs, 0.7).count()
            docs.unpersist()
            t3 = time.time()
            print(
                f"trial {trial}: total={t3-t0:.3f} pivot={t1-t0:.3f} "
                f"pairs={t2-t1:.3f} verify={t3-t2:.3f} n={n}"
            )
    elif which == "triangle":
        for trial in range(3):
            t0 = time.time()
            kernels.triangle_count(g.sym).collect()
            print(f"trial {trial}: wall={time.time()-t0:.3f}")


if __name__ == "__main__":
    main()
