from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    import json as _json

    from hadoop_prototype_spark.session import get_spark

    extra = _json.loads(os.environ.get("SPARK_GRAFT_TEST_CONF", "{}"))
    spark = get_spark(app_name="hps-tests", extra_conf=extra)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
