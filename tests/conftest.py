import pytest

from snapflow_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    spark = build_session("snapflow-spark-tests", master="local[4]")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield spark
    spark.stop()
