import os
import sys
import tempfile

import pytest

sys.path.insert(0, "/root/repo")

# Test-state scratch on tmpfs: the sandbox block device is IOPS-throttled
# (~65 MB/s) and injects multi-10s stalls into store writes.
if os.path.isdir("/dev/shm"):
    os.makedirs("/dev/shm/crawlspark-tests", exist_ok=True)
    tempfile.tempdir = "/dev/shm/crawlspark-tests"


@pytest.fixture(scope="session")
def spark():
    from crawlspark.session import get_spark

    s = get_spark("pytest", cores=8, driver_mem="10g")
    yield s
    s.stop()
