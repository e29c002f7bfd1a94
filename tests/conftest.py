from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mit6_5840_6_824_lab1_mapreduce_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # local[4,2]: 4 threads, 2 task attempts — so injected-failure
    # retry tests exercise the re-execution path (reference C9 analog).
    s = get_spark(app_name="pytest", master="local[4,2]", shuffle_partitions=8)
    yield s
    s.stop()
