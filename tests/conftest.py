from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from spark_streaming_kafka2elasticsearch_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    spark = build_session(
        master="local[4]",
        app_name="tests",
        extra_conf={"spark.sql.shuffle.partitions": "4"},
    )
    yield spark


SF_DIR = "/root/testdata/sf0.001"
