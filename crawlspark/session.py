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


_CKPT_PATHS: list[str] = []
# itertools.count is atomic under the GIL — CatalogStore.commit calls ckpt
# from a ThreadPoolExecutor (one thread per table), so a read-then-increment
# seq would let two tables race to the same scratch directory.
import itertools as _itertools

_CKPT_SEQ = _itertools.count()


def ckpt(df, eager: bool = True):
    """Round-pivot materialization with switchable backing
    (SPARK_GRAFT_CKPT):

      parquet — write to a scratch parquet table (tmpfs) and read
        it back. The JVM holds NO block-manager live set, so the GC never
        traces checkpoint data (measured: deserialized blocks at 8-way
        parallelism spent 60-90 s/stage in GC); reads come back through the
        vectorized, largely off-heap parquet reader. This is also exactly
        what the engine does on a real cluster (Iceberg round tables), so
        local behavior matches the scale-out story. Call clear_ckpts() when
        a round's pivots are dead.
      deser (default) — stock localCheckpoint (deserialized blocks);
        fastest locally under ParallelGC (A/B at n=16M: 104 s vs 173-190 s
        parquet), and on a real cluster the narrow pivots are small per
        executor. Use parquet mode where executor loss must be recoverable
        without lineage (it is what Iceberg round tables give a cluster).
      ser   — localCheckpoint with serialized block storage.
    """
    mode = os.environ.get("SPARK_GRAFT_CKPT", "deser")
    if mode == "parquet":
        d = os.path.join(_scratch_dir(), "ckpt",
                         f"{os.getpid()}_{next(_CKPT_SEQ)}")
        df.write.mode("overwrite").parquet(d)
        _CKPT_PATHS.append(d)
        return df.sparkSession.read.parquet(d)
    if mode == "ser":
        from pyspark import StorageLevel
        return df.localCheckpoint(eager=eager,
                                  storageLevel=StorageLevel.MEMORY_AND_DISK)
    return df.localCheckpoint(eager=eager)


def clear_ckpts() -> None:
    """Delete dead scratch-parquet checkpoints (parquet ckpt mode)."""
    import shutil
    while _CKPT_PATHS:
        shutil.rmtree(_CKPT_PATHS.pop(), ignore_errors=True)


def get_spark(app: str = "crawlspark", cores: int | None = None,
              shuffle_partitions: int | None = None,
              driver_mem: str | None = None,
              adaptive: bool | None = None) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or int(os.environ.get(
        "SPARK_GRAFT_SHUFFLE", str(max(cores, 8))))
    # Heap: big enough for checkpoint blocks, small enough that full GCs
    # stay short — 48g heaps showed multi-10s GC variance in bench runs.
    # 8g, not 20g: ParallelGC full-GC cost tracks heap size, and the
    # measured ordering 8g < 12g < 20g held across interleaved trials at
    # local[8] AND local[32] (wide n=8M rounds; ~10-20% wall). A full
    # bench.py pass (sf0.1, local[32], every query + t2 crawl) runs clean
    # at 8g — checkpoint pivots spill to disk-backed storage if squeezed.
    driver_mem = driver_mem or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    # AQE default OFF: the engine's plans carry explicit broadcast hints
    # and salting, so AQE only adds re-optimization rounds — the t1 job
    # audit counted ~57 async broadcast/replan jobs per round, and the
    # interleaved A/B (scripts/aqe_ab.py, canaries attached) measured the
    # wide n=4M round 35-60% faster with AQE off (93.1/124.7 s on vs
    # 58.0/86.1 s off). On a real cluster with unknown skew flip
    # SPARK_GRAFT_AQE=1 — skew-join/coalesce settings stay ready.
    if adaptive is None:
        adaptive = os.environ.get("SPARK_GRAFT_AQE", "0") == "1"
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
        .config("spark.driver.extraJavaOptions",
                "-Djava.net.preferIPv4Stack=true"
                + (" -XX:+UseParallelGC"
                   if os.environ.get("SPARK_GRAFT_GC", "parallel") == "parallel"
                   else "")
                # GC threads track the executor-thread count, not the host's
                # vCPUs: the JVM defaults to ~5/8 of 32 vCPUs (≈23 GC
                # threads), which oversubscribes a local[2]/local[8] run on
                # a bandwidth-capped host — pause work then contends with
                # itself. Default = cores (the local[N] level); override
                # with SPARK_GRAFT_GC_THREADS.
                + (f" -XX:ParallelGCThreads="
                   f"{os.environ.get('SPARK_GRAFT_GC_THREADS', cores)}"
                   if os.environ.get("SPARK_GRAFT_GC", "parallel") == "parallel"
                   and os.environ.get("SPARK_GRAFT_GC_THREADS", "") != "default"
                   else ""))
        # Shuffle/spill scratch on tmpfs: the sandbox block device is IOPS-
        # throttled (~65 MB/s) and caused multi-10s random stalls; a real
        # cluster's executors write shuffle to fast local NVMe — tmpfs is
        # the honest local analog. Override with SPARK_GRAFT_LOCAL_DIR.
        .config("spark.local.dir", _scratch_dir())
    )
    if os.environ.get("SPARK_GRAFT_EVENTLOG"):
        ev_dir = os.path.join(_scratch_dir(), "spark-events")
        os.makedirs(ev_dir, exist_ok=True)
        builder = (builder
                   .config("spark.eventLog.enabled", "true")
                   .config("spark.eventLog.compress", "false")
                   .config("spark.eventLog.dir", ev_dir))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
