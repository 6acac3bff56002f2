import os
import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder
         .master(os.environ.get("SPARK_TEST_MASTER", "local[8]"))
         .appName("lucene-spark-tests")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory",
                 os.environ.get("SPARK_TEST_DRIVER_MEM", "4g"))
         .getOrCreate())
    yield s
    s.stop()


@pytest.fixture()
def tmp_index_dir():
    d = tempfile.mkdtemp(prefix="lucene_spark_idx_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
