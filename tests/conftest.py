import os
import sys

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)


@pytest.fixture(scope="session")
def spark():
    from s2geometry_spark.session import get_spark

    s = get_spark(app_name="s2spark-tests", shuffle_partitions=8)
    yield s
    s.stop()
