from __future__ import annotations

import pytest

from sbb_ned_spark import fixtures
from sbb_ned_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="sbb_ned_spark-tests", master="local[8]")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_files(spark):
    return fixtures.load_files_df(spark, "tiny").persist()


@pytest.fixture(scope="session")
def tiny_truth(spark):
    _, members = fixtures.generate_files_pdf("tiny")
    labeled = fixtures.generate_labeled_pairs_pdf(members)
    return members, labeled


SF_DIR = "/root/testdata/sf0.001"
