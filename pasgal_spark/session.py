"""SparkSession factory with scale-oriented defaults.

Tuned for the link-graph workload: AQE on (runtime broadcast + skew-join
splitting — the Spark analog of PASGAL's sparse/dense direction switching,
reference src/BFS/bfs.h:160-162), Arrow enabled for pandas-UDF kernels,
shuffle partitions sized for the local harness but overridable for clusters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pasgal-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's default conf.

    On a real cluster, pass ``master=None`` and let spark-submit decide;
    locally we default to ``local[$SPARK_GRAFT_CPUS|*]``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    # Avoid reverse-DNS stalls in sandboxed/local environments.
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime re-planning — broadcast small frontiers, split skewed
        # shuffle partitions (power-law web graphs concentrate hub keys).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Size post-shuffle partitions by BYTES, not by core count (guide
        # §2.2): with parallelismFirst=true (the default) AQE keeps
        # ~defaultParallelism partitions even for KB-sized superstep state,
        # so every iterative kernel pays 32 near-empty reduce tasks per
        # exchange. parallelismFirst=false makes AQE honor the advisory
        # size — tiny state coalesces to one task, TB shuffles still get
        # thousands of partitions. Advisory is env-overridable for cluster
        # tiers (64m local default; 256m is the guide's big-ETL figure).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_ADVISORY_PARTITION_SIZE", "64m"),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for pandas UDF / toPandas paths (vectorized, no per-row Python).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Broadcast only the genuinely small side (r6: back to the 10 MB
        # default — the old 32 MB widening existed for iterative state
        # joins, which now pick their strategy explicitly via the
        # SHUFFLE_HASH hint; at 32 MB Catalyst broadcast a 1.5M-row
        # oriented-edge table twice per triangle count, 9.5 s vs 3.9 s
        # shuffled-hash at the 10x tier) and allow shuffled hash join
        # when a side fits a per-partition hash map (guide §3.1/§9 —
        # sort-merge remains the automatic fallback past that).
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # Stats guard for iterative plans: relations without statistics
        # (localCheckpoint LogicalRDDs — every superstep state) default to
        # sizeInBytes = Long.MaxValue (2^63). Catalyst's size-only stats
        # visitor MULTIPLIES child sizes at each join, so a plan stacking
        # tens of joins/self-joins over checkpointed state (every kernel
        # here) makes sizeInBytes a BigInteger with millions of bits —
        # measured 20+ min of driver CPU inside BigInteger.multiply during
        # planning of the BCC euler path. A finite default (1 TiB) keeps
        # products tiny while still far above any broadcast threshold, so
        # join strategy choices are unchanged.
        .config("spark.sql.defaultSizeInBytes", str(1 << 40))
        # Quiet local runs.
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
