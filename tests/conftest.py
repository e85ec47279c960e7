from __future__ import annotations

import pytest

from sqlbackuphistoryetl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="sbh-tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def consolidated(spark):
    from sqlbackuphistoryetl_spark.sources.fixtures import consolidated_df

    df = consolidated_df(spark).cache()
    df.count()
    return df
