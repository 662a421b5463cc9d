from __future__ import annotations

import pytest

from web_crawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("wcs-tests", parallelism=8, shuffle_partitions=8)
    yield s
    s.stop()
