import pytest


@pytest.fixture(scope="session")
def spark():
    from azure_based_pii_redactor_spark.engine.session import build_session

    s = build_session(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
