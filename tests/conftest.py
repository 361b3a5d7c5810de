"""Shared Spark session for tests — one JVM for the whole run.

local[4] with tiny shuffle-partition count: tests verify semantics, not
scale; bench.py measures scale.
"""

from __future__ import annotations

import pytest

from dedupe_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "dedupe_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
