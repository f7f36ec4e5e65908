import pytest


@pytest.fixture(scope="session")
def spark():
    from knowledge_graph_studio_spark.session import get_spark

    s = get_spark("kgs-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
