from pasgal_spark.functions import textstats, dedup, similarity  # noqa: F401
