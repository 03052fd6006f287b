"""SparkSession factory tuned for the sandbox (local[N]) and for clusters.

Local mode is one JVM; `spark.driver.memory` is the only memory knob. On a
real cluster the same builder config applies minus master/driver-memory
(spark-submit provides them); AQE + adaptive skew-join stay on either way.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _scratch_dir() -> str:
    d = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if not d:
        d = "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp"
    os.makedirs(d, exist_ok=True)
    return d


def get_spark(app: str = "crawlspark", cores: int | None = None,
              shuffle_partitions: int | None = None,
              driver_mem: str | None = None,
              adaptive: bool | None = None) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or max(cores, 8)
    # Heap: big enough for checkpoint blocks, small enough that full GCs
    # stay short — 48g heaps showed multi-10s GC variance in bench runs.
    driver_mem = driver_mem or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g")
    if adaptive is None:
        adaptive = os.environ.get("SPARK_GRAFT_AQE", "1") == "1"
    builder = (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", str(adaptive).lower())
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
        # Shuffle/spill scratch on tmpfs: the sandbox block device is IOPS-
        # throttled (~65 MB/s) and caused multi-10s random stalls; a real
        # cluster's executors write shuffle to fast local NVMe — tmpfs is
        # the honest local analog. Override with SPARK_GRAFT_LOCAL_DIR.
        .config("spark.local.dir", _scratch_dir())
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
