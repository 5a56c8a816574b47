from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from near_public_lakehouse_spark.session import get_spark

    spark = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def oracle():
    from near_public_lakehouse_spark.testing.compare import duckdb_oracle

    con = duckdb_oracle(SF_DIR)
    yield con
    con.close()
