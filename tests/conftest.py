import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from crawlspark.session import get_spark

    s = get_spark("pytest", cores=8, driver_mem="10g")
    yield s
    s.stop()
