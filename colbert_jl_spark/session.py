"""SparkSession factory tuned for the engine.

Centralizes the session configuration so tests, bench.py and the driver
entry all agree: AQE on (runtime re-plan + skew-join splitting), Arrow on
(every Python crossing is a vectorized Arrow batch, never per-row), and a
shuffle-partition count sized to the local core count. On a real cluster
these are spark-submit --conf values; nothing here is local-mode-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "colbert_jl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract);
    bench.py overrides it to run the identical job at two parallelism
    levels for the scaling-efficiency evidence (BASELINE.json north_rule).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # one shuffle partition per core locally; on a cluster this is
        # sized to total executor cores (AQE coalesces small ones anyway)
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    # pin BLAS pools inside pandas-UDF workers: every worker spinning a
    # full-width OpenBLAS pool oversubscribes the box catastrophically when
    # 32 workers run concurrently (numpy codec work is elementwise anyway)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local/bench scale: inputs are small parquet files; without these
        # the scan parallelism is capped at the file count and nothing
        # downstream can scale past it. On a 100 TB cluster the default
        # 128m is right — these are sized to the data, not the engine.
        .config("spark.sql.files.maxPartitionBytes", os.environ.get("SPARK_MAX_PARTITION_BYTES", "8m"))
        .config("spark.sql.files.openCostInBytes", "1m")
        # zstd shuffle/spill compression: the posting shuffle is the
        # build's largest I/O; better ratio than lz4 at similar CPU
        .config("spark.io.compression.codec", "zstd")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
