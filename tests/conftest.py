from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from key_resource_table_extractor_spark.session import build_session

    s = build_session(
        app_name="krt-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            # small Arrow batches so multi-batch paths are exercised in tests
            "spark.sql.execution.arrow.maxRecordsPerBatch": "64",
            "spark.driver.memory": "4g",
        },
    )
    yield s
    s.stop()
