from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from credigraph_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # Small shuffle fan-out: test graphs are tiny, and 200/32 partitions of
    # ~10 rows just add scheduler latency.
    s = get_spark("credigraph-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def edges_df(spark, pairs, cols=("src", "dst")):
    return spark.createDataFrame([(int(a), int(b)) for a, b in pairs], list(cols))
