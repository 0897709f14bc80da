import pytest

from entity_resolver_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="entity_resolver_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus(spark):
    """Seeded synthetic transcript corpus + labeled pairs (60 families)."""
    from entity_resolver_spark.datagen import corpus_spark

    tdf, ldf = corpus_spark(spark, n_base=60)
    tdf.cache().count()
    ldf.cache().count()
    return tdf, ldf
