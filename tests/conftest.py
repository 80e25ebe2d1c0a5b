import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from ghcrawler_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def ddb():
    return duckdb.connect()
