from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pasgal_spark.session import get_spark

    s = get_spark(app_name="pasgal-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


def edges_df(spark, pairs):
    """Tiny directed edge DataFrame from literal (src, dst) pairs."""
    return spark.createDataFrame(pairs, "src long, dst long")


def vertices_df(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "id long")
