"""SparkSession factory with the engine's pinned configs."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """min(48g, ~60% of MemAvailable): the 6M-doc benchmark box wants 48g
    (packed-postings cache + execution, see below), but a blanket 48g default
    would push smaller hosts into swap/OOM instead of failing gracefully
    (ADVICE r3). SPARK_DRIVER_MEM always overrides."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    avail_gb = int(line.split()[1]) // (1024 * 1024)
                    return f"{max(2, min(48, (avail_gb * 3) // 5))}g"
    except OSError:
        pass
    return "24g"


def get_spark(
    app_name: str = "opensearch_loader_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # file-scan parallelism sized by DATA, not cores: Spark plans file
        # splits as totalBytes/defaultParallelism when files are small, so a
        # 2-core job reading a compact (highly-compressed) table gets 2 fat
        # splits — the index build's tokenize stage then runs as 2 huge
        # Python tasks regardless of the table's 32-file layout (measured
        # 2.3× slower than 32 small splits on the same data). Floor the
        # split count like shuffle partitions: excess splits just queue.
        .config("spark.sql.files.minPartitionNum", str(max(32, cores)))
        # 48g: the build caches the packed-postings table (MEMORY_AND_DISK)
        # while writing term_stats/lineage from it; at 6M+ docs a 24g heap
        # pushed storage vs execution into eviction thrash (measured 4×
        # throughput loss vs 2M). Local-mode knob — on a real cluster this
        # is per-executor memory sized to partition volume.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEM") or _default_driver_mem(),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # RAM-backed shuffle dirs: the sandbox's /tmp sits on a single vda
        # disk that collapses under many concurrent shuffle writers; a real
        # cluster would use striped local SSDs (this is a local-mode knob,
        # not a design assumption)
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
