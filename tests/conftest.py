from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def spark():
    # small fixtures → a few local threads beat 32 (task-launch overhead
    # dominates); production parallelism is exercised by bench.py instead
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from genie_spark.session import get_spark

    s = get_spark(
        "genie_spark_tests",
        shuffle_partitions=4,
        extra_conf={"spark.default.parallelism": "4"},
    )
    yield s
