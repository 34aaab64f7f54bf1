import tempfile

import pytest

from cryptocurrency_data_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        # Static conf: must be set before the JVM session exists (the
        # bucketed-table tests need a writable warehouse).
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-wh-")},
    )
    yield s
