import pytest


@pytest.fixture(scope="session")
def spark():
    from kgpipe.session import get_spark

    spark = get_spark(app_name="kgpipe-tests", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def small_corpus():
    from kgpipe.corpus import generate_corpus

    return generate_corpus(n_hanzi=20, n_words=30, n_idioms=20, seed=42)
