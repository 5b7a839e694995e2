from __future__ import annotations

import pytest

from rocana_impala_udfs_spark import get_spark, register_all

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # local[4] + >1 shuffle partitions so partial/merge paths genuinely run
    # (mirrors the reference harness's multi-distribution execution,
    # median-test.cc:30-31).
    s = get_spark("rocana-tests", master="local[4]", shuffle_partitions=4)
    register_all(s)
    yield s
