from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqldataintegrationfunctiontriggerapp_spark.session import get_session

SF_DIR = "/root/testdata/sf0.001"  # smallest fixtures: tests stay fast


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="engine-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
