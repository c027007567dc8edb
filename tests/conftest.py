from __future__ import annotations

import pytest

from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    from nebula_importer_spark.session import get_spark

    s = get_spark(app_name="nebula-importer-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def records_df(spark: SparkSession, records: list[list[str]]):
    """Build a record DataFrame like the reference's []Record batches."""
    return spark.createDataFrame([(r,) for r in records], "record array<string>")
