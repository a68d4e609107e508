from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_reaction_database_web_scraper_spark.session import get_session

TESTDATA = "/root/testdata/sf0.001"
REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def spark():
    s = get_session("pytest", extra_conf={
        "spark.sql.shuffle.partitions": "8",
    })
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    if not os.path.isdir(TESTDATA):
        pytest.skip("driver testdata not present")
    return TESTDATA


@pytest.fixture(scope="session")
def golden_files() -> list[str]:
    import glob
    files = sorted(glob.glob(f"{REFERENCE}/ord_formatted_data*.json"))
    if not files:
        pytest.skip("reference golden corpus not present")
    return files
