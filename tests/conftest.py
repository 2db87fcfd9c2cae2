from __future__ import annotations

import pytest

from juniper_syslog_filter_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="jsf-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
