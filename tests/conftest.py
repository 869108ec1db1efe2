from __future__ import annotations

import pytest

from nyc_taxi_data_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    from tests.oracle_harness import duck_connection

    con = duck_connection()
    yield con
    con.close()
