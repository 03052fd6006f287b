"""SparkSession factory tuned for the sandbox (local[N]) and for clusters.

Local mode is one JVM; `spark.driver.memory` is the only memory knob. On a
real cluster the same builder config applies minus master/driver-memory
(spark-submit provides them); AQE + adaptive skew-join stay on either way.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "crawlspark", cores: int | None = None,
              shuffle_partitions: int | None = None,
              driver_mem: str = "48g") -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
