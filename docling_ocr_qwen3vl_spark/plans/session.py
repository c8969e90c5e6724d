"""SparkSession construction with scale-appropriate defaults.

The engine targets 1000-executor clusters reading 100 TB; the knobs below are
the ones that matter there and are harmless on local[N]:

  * AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
    documents have wildly varying sizes, so static planning under-performs.
  * Arrow enabled and batch size tuned: every expensive stage is a pandas
    UDF / mapInPandas over Arrow batches (no per-row Python anywhere).
  * shuffle partitions default to a multiple of parallelism; at cluster
    scale this is overridden by the submitter (or AQE coalesces).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "docling-ocr-qwen3vl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[*]"
    builder = SparkSession.builder.appName(app_name).master(master)

    cpus = os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", str(max(cpus, 8))))

    conf = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # big enough to amortize Python-worker round trips for the parse UDFs,
        # small enough that a batch of page payloads fits comfortably in
        # memory (~13 MB at 32768 pages x ~400 B).  Swept on the stub-decode
        # pipeline at local[32], sf0.1 x64 replication, min-of-4+:
        # 8192 -> 8.0 s, 16384 -> 3.5 s, 32768 -> 2.3 s (consistent ordering
        # across independent runs; the earlier 8192 default came from a
        # within-noise sweep under lighter host load)
        "spark.sql.execution.arrow.maxRecordsPerBatch": os.environ.get(
            "SPARK_GRAFT_ARROW_BATCH", "32768"
        ),
        # 128 MiB input splits: the sweet spot for Parquet scans at 100 TB
        "spark.sql.files.maxPartitionBytes": "134217728",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.session.timeZone": "UTC",
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    }
    # shuffle spill to tmpfs when available: local-mode shuffles on a shared
    # sandbox disk serialize on I/O; a real cluster has per-executor local SSDs
    shm = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
    try:
        os.makedirs(shm, exist_ok=True)
        conf["spark.local.dir"] = shm
    except OSError:
        pass
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
