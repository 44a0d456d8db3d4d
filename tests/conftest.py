import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    session = (
        SparkSession.builder.master(os.environ.get("SPARK_MASTER", "local[8]"))
        .config("spark.sql.shuffle.partitions",
                os.environ.get("SPARK_TEST_SHUFFLE_PARTITIONS", "1"))
        # AQE off for tests: fixtures are tiny, and AQE schedules every
        # exchange as its own query stage at ~200-300 ms of driver fixed
        # cost — a single golden-fixture action was measured at 33 s
        # with AQE on vs ~2 s off.  Benches/production paths keep it on.
        .config("spark.sql.adaptive.enabled",
                os.environ.get("SPARK_TEST_AQE", "false"))
        # Whole-stage codegen off for tests: fixture-scale queries spend
        # their time in Janino compilation (with a global compile-cache
        # lock that serializes the fixture thread pool), not execution —
        # the 16-case frame-fixture pool measured 280 s with codegen on
        # vs 168 s off.  Constraint propagation is superlinear on the
        # engine's deep filter/join trees; same story.  Benches and
        # production sessions keep Spark defaults (codegen on).
        .config("spark.sql.codegen.wholeStage",
                os.environ.get("SPARK_TEST_CODEGEN", "false"))
        .config("spark.sql.constraintPropagation.enabled",
                os.environ.get("SPARK_TEST_CONSTRAINTS", "false"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .appName("ramp-shapes-spark-tests")
        .getOrCreate()
    )
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


REFERENCE_TEST_DATA = "/root/reference/test-data"
