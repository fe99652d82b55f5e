from pasgal_spark.plans.checkpoints import CheckpointedPageRank, RunManifest  # noqa: F401
