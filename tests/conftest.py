from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")
# Python workers must be able to import the package and test helpers
_paths = [p for p in ("/root/repo", os.path.dirname(__file__)) if p]
os.environ["PYTHONPATH"] = os.pathsep.join(
    _paths + ([os.environ["PYTHONPATH"]] if os.environ.get("PYTHONPATH") else [])
)


@pytest.fixture(scope="session")
def spark():
    from flink_invoice_processor_spark.session import get_spark

    spark = get_spark("tests", shuffle_partitions=4)
    yield spark
    spark.stop()


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
