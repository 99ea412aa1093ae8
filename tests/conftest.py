import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from text_dedup_spark.session import get_spark

    s = get_spark(
        "text-dedup-spark-tests",
        master="local[4]",
        conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.driver.memory": "4g",
        },
    )
    yield s
    s.stop()
