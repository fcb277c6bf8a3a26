import tempfile

import pytest

from hillview_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="hillview-spark-tests", master="local[4]", shuffle_partitions=4,
        extra_conf={
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-wh-"),
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tables(spark):
    from hillview_spark.tables import load_all

    return load_all(spark, SF_DIR)
