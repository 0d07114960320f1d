from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from colbert_jl_spark.session import get_spark

    s = get_spark("colbert-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs001(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet").cache()


@pytest.fixture(scope="session")
def docs01(spark):
    return spark.read.parquet(f"{SF01}/documents.parquet").cache()
