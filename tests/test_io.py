"""Edge-table interchange format round-trips (reference §2A parity)."""

from __future__ import annotations

from pasgal_spark.sources import edgelist
from tests.conftest import edges_df


PAIRS = [(0, 1), (1, 2), (2, 0), (5, 3)]


def test_text_roundtrip(spark, tmp_path):
    edges = edges_df(spark, PAIRS)
    p = str(tmp_path / "el")
    edgelist.write_edges_text(edges, p)
    back = edgelist.read_edges_text(spark, p)
    assert sorted(tuple(r) for r in back.collect()) == sorted(PAIRS)


def test_weighted_text_roundtrip(spark, tmp_path):
    w = spark.createDataFrame(
        [(u, v, (u + v) % 7 + 1) for u, v in PAIRS], "src long, dst long, w long"
    )
    p = str(tmp_path / "wel")
    edgelist.write_edges_text(w, p)
    back = edgelist.read_edges_text(spark, p, weighted=True)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        (u, v, (u + v) % 7 + 1) for u, v in PAIRS
    )


def test_parquet_layout_roundtrip(spark, tmp_path):
    edges = edges_df(spark, PAIRS)
    p = str(tmp_path / "pq")
    edgelist.write_edges(edges, p, buckets=4)
    back = edgelist.read_edges(spark, p, partitions=4)
    assert sorted(tuple(r) for r in back.collect()) == sorted(PAIRS)
    assert back.rdd.getNumPartitions() == 4


def test_convert_text_to_binary(spark, tmp_path):
    """pbbs2bin analog: text edge list -> engine parquet, one job.

    Mirrors the reference's standalone converter
    (src/utils/pbbs2bin.cpp): parse the slow interchange format once,
    land the fast layout, and read back exchange-free.
    """
    edges = edges_df(spark, PAIRS)
    tp = str(tmp_path / "txt")
    bp = str(tmp_path / "bin")
    edgelist.write_edges_text(edges, tp)
    back = edgelist.convert_text_to_binary(spark, tp, bp, buckets=4)
    assert sorted(tuple(r) for r in back.collect()) == sorted(PAIRS)
    # the landed layout honours the engine contract: bucketed partitions
    assert back.rdd.getNumPartitions() == 4
