import pytest

from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="caf-spark-tests", shuffle_partitions=4)
    yield s
