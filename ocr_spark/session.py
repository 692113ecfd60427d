"""SparkSession builder with the engine's standard knobs."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ocr_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """local[cores] session tuned for the Arrow-heavy extraction pipeline.

    On a real cluster the same confs ship via spark-submit; only the master
    changes. AQE stays on for runtime skew/partition coalescing; Arrow batches
    are capped so html-heavy batches fit executor memory (SURVEY.md §4.2).
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or max(2 * cores, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.files.maxPartitionBytes", "64m")
        # Heap scales with cores (as cluster memory scales with executors):
        # allocation rate grows with task slots, and an undersized heap turns
        # into GC pressure — measured 17% at local[32] (8g -> 24g).
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", f"{max(6, (cores * 3) // 4)}g"),
        )
        # Throughput GC: the interpreted-expression blocks allocate heavily;
        # G1's pacing cost ~30% of wall at 32 threads (measured at 96k pages:
        # 19.5s G1 -> 14.1s ParallelGC).
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
