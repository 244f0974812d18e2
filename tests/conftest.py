import pytest

from sparkmedkg import fixtures, schemas
from sparkmedkg.session import get_spark

N_DOCS = 300


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="sparkmedkg-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "6g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def doc_rows():
    return fixtures.gen_doc_rows(N_DOCS)


@pytest.fixture(scope="session")
def docs(spark, doc_rows):
    return spark.createDataFrame(doc_rows, schemas.DOCS_SCHEMA).cache()


@pytest.fixture(scope="session")
def lkp(spark):
    return fixtures.lookups(spark)


@pytest.fixture(scope="session")
def gold(doc_rows):
    from sparkmedkg import golden

    return golden.run(doc_rows)


@pytest.fixture(scope="session")
def tables(spark, docs, lkp):
    from sparkmedkg import pipeline

    return pipeline.build_graph(spark, docs, lkp)
