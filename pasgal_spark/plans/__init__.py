"""Superstep driver plans: checkpointing, resumability, lineage utilities.

Lazy re-exports (PEP 562) — ``checkpoints`` imports graph kernels, and the
kernels import ``plans.lineage``; an eager import here would close that
loop into a circular-import crash.
"""


def __getattr__(name):
    if name in (
        "CheckpointedPageRank",
        "CheckpointedConnectedComponents",
        "CheckpointedLabelPropagation",
        "RunManifest",
    ):
        from pasgal_spark.plans import checkpoints

        return getattr(checkpoints, name)
    raise AttributeError(name)
