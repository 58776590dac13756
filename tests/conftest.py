from __future__ import annotations

import pytest

from ploverdb_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # Low shuffle parallelism: test data is tiny and task-scheduling
    # overhead dominates otherwise. Scale configs live in get_spark.
    s = get_spark(
        "ploverdb_spark_tests",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    yield s
