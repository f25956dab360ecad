import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from crawler_ai_spark.sources import fixtures as FX


@pytest.fixture(scope="session")
def fixture_root() -> pathlib.Path:
    FX.ensure_all()
    return FX.FIXTURE_ROOT


@pytest.fixture(scope="session")
def spark():
    from crawler_ai_spark.session import get_spark

    spark = get_spark("crawler-ai-spark-tests", cores=4, shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def pages_sf0001(spark, fixture_root):
    return spark.read.parquet(str(fixture_root / "sf0.001" / "pages.parquet"))


@pytest.fixture(scope="session")
def pages_sf001(spark, fixture_root):
    return spark.read.parquet(str(fixture_root / "sf0.01" / "pages.parquet"))
