"""Graph interchange formats (reference §2A parity).

The reference reads/writes PBBS text adjacency and a binary CSR format
(/root/reference/src/graph.h:112-194,249-306). Our canonical storage is
parquet (columnar = the CSR idea as a table), and for interchange we keep
the two shapes that matter:

- **text edge list** — one ``src<TAB>dst[<TAB>w]`` line per edge; the
  lowest-common-denominator exchange format (reads distributed via
  spark.read.csv, no driver-side parsing).
- **partitioned parquet** — ``write_edges``/``read_edges`` with the
  engine's layout contract applied on read: hash-partitioned by ``src``,
  sorted within partitions, ready for exchange-free superstep joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

EDGE_SCHEMA = StructType(
    [StructField("src", LongType(), False), StructField("dst", LongType(), False)]
)
WEDGE_SCHEMA = StructType(
    EDGE_SCHEMA.fields + [StructField("w", LongType(), False)]
)


def write_edges_text(edges: DataFrame, path: str) -> None:
    """Tab-separated edge list (optionally weighted)."""
    edges.write.mode("overwrite").option("sep", "\t").csv(path)


def read_edges_text(spark: SparkSession, path: str, *, weighted: bool = False) -> DataFrame:
    schema = WEDGE_SCHEMA if weighted else EDGE_SCHEMA
    return spark.read.option("sep", "\t").schema(schema).csv(path)


def write_edges(edges: DataFrame, path: str, *, buckets: int = 32) -> None:
    """Engine-layout parquet sink: partitioned by hash(src) buckets.

    On a cluster this would be a bucketed/Iceberg table; partitioning at
    write time means a fresh session can re-load without a shuffle.
    """
    (
        edges.withColumn("bucket", F.pmod(F.hash("src"), F.lit(buckets)))
        .repartition(buckets, "bucket")
        .sortWithinPartitions("src")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def read_edges(
    spark: SparkSession, path: str, *, partitions: int = 32, relayout: bool = True
) -> DataFrame:
    """Load an edge table and (optionally) restore the superstep layout."""
    df = spark.read.parquet(path).drop("bucket")
    if relayout:
        df = df.repartition(partitions, "src").sortWithinPartitions("src")
    return df


def convert_text_to_binary(
    spark: SparkSession,
    text_path: str,
    out_path: str,
    *,
    weighted: bool = False,
    buckets: int = 32,
) -> DataFrame:
    """Text edge list → engine-layout parquet, one distributed job.

    The reference ships ``pbbs2bin`` (/root/reference/src/utils/
    pbbs2bin.cpp), a standalone converter from PBBS text adjacency to its
    binary CSR: parse once on ingest, then every benchmark run reads the
    fast layout. This is the same tool in engine terms — distributed text
    parse (``read_edges_text``) into the bucketed/sorted parquet sink
    (``write_edges``), so every later session re-loads exchange-free.
    Returns the re-read DataFrame so callers can validate the round-trip.
    """
    write_edges(read_edges_text(spark, text_path, weighted=weighted),
                out_path, buckets=buckets)
    return read_edges(spark, out_path, partitions=buckets)
