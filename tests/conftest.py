import pytest


@pytest.fixture(scope="session")
def spark():
    from jsonld_streaming_parser_js_spark.sources.session import get_spark
    spark = get_spark(app="tests", cores=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
